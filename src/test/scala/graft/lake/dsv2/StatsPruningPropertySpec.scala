package graft.lake.dsv2

import graft.lake.{ColStats, DataFileMeta, TruncateSpec}
import org.apache.spark.sql.sources._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

/** Soundness property for manifest stats pruning: `accept` may only reject
  * a file when NO row in it can match — pruning a file that holds a
  * matching row is the silent-wrong-answer failure mode, so we fuzz it:
  * generate a file's actual rows, derive the exact footer stats the writer
  * would produce, throw random filters at `accept`, and evaluate the same
  * filter row-by-row. Whenever a row matches, the file must survive.
  * (The converse — rejecting every non-matching file — is deliberately NOT
  * required: pruning is an optimization; unknowns keep the file.)
  */
class StatsPruningPropertySpec extends AnyFunSuite {

  private val Width = 1000L
  private val spec = TruncateSpec("p", Width)

  private case class Row(p: Long, v: Option[Long], s: Option[String])

  private val rowGen: Gen[Row] = for {
    p <- Gen.choose(0L, 10L * Width)
    v <- Gen.option(Gen.choose(-100L, 100L))
    s <- Gen.option(Gen.oneOf("a", "ab", "abc", "b", "bc", "zz", ""))
  } yield Row(p, v, s)

  /** Footer-faithful stats: min/max over present values, null/value counts;
    * domain omitted entirely when every value is null (parquet writes no
    * min/max then) — mirrors LakeWriter.footerMeta's "partial evidence
    * invalidates the domain" rule.
    */
  private def fileOf(rows: List[Row]): DataFileMeta = {
    def longStats(vs: List[Option[Long]]): ColStats = {
      val present = vs.flatten
      ColStats(
        longMin = present.minOption, longMax = present.maxOption,
        strMin = None, strMax = None,
        nullCount = Some(vs.count(_.isEmpty).toLong),
        valueCount = Some(vs.size.toLong))
    }
    def strStats(vs: List[Option[String]]): ColStats = {
      val present = vs.flatten
      ColStats(
        longMin = None, longMax = None,
        strMin = present.minOption, strMax = present.maxOption,
        nullCount = Some(vs.count(_.isEmpty).toLong),
        valueCount = Some(vs.size.toLong))
    }
    DataFileMeta("f", 1L, rows.size.toLong, spec(rows.head.p), "parquet",
      Map("v" -> longStats(rows.map(_.v)), "s" -> strStats(rows.map(_.s))))
  }

  private val filterGen: Gen[Filter] = {
    val vCol = Gen.const("v"); val sCol = Gen.const("s")
    val leafV: Gen[Filter] = for {
      c <- vCol; x <- Gen.choose(-120L, 120L)
      f <- Gen.oneOf[Filter](EqualTo(c, x), GreaterThan(c, x),
        GreaterThanOrEqual(c, x), LessThan(c, x), LessThanOrEqual(c, x),
        In(c, Array(x, x + 3)), IsNull(c), IsNotNull(c), EqualNullSafe(c, x))
    } yield f
    val leafS: Gen[Filter] = for {
      c <- sCol; x <- Gen.oneOf("a", "ab", "b", "z", "")
      f <- Gen.oneOf[Filter](EqualTo(c, x), GreaterThan(c, x), LessThan(c, x),
        StringStartsWith(c, x), IsNull(c), IsNotNull(c))
    } yield f
    val leafP: Gen[Filter] = for {
      x <- Gen.choose(0L, 11L * Width)
      f <- Gen.oneOf[Filter](EqualTo("p", x), GreaterThan("p", x),
        LessThan("p", x), GreaterThanOrEqual("p", x), LessThanOrEqual("p", x))
    } yield f
    val leaf = Gen.oneOf(leafV, leafS, leafP)
    for {
      a <- leaf; b <- leaf
      f <- Gen.oneOf[Filter](a, And(a, b), Or(a, b))
    } yield f
  }

  /** Row-level truth with SQL three-valued semantics collapsed to "matches".  */
  private def matches(r: Row, f: Filter): Boolean = f match {
    case EqualTo("p", x: Long) => spec(r.p) == spec(x) || r.p == x
    case GreaterThan("p", x: Long) => r.p > x
    case GreaterThanOrEqual("p", x: Long) => r.p >= x
    case LessThan("p", x: Long) => r.p < x
    case LessThanOrEqual("p", x: Long) => r.p <= x
    case EqualTo("v", x: Long) => r.v.contains(x)
    case EqualNullSafe("v", x: Long) => r.v.contains(x)
    case GreaterThan("v", x: Long) => r.v.exists(_ > x)
    case GreaterThanOrEqual("v", x: Long) => r.v.exists(_ >= x)
    case LessThan("v", x: Long) => r.v.exists(_ < x)
    case LessThanOrEqual("v", x: Long) => r.v.exists(_ <= x)
    case In("v", xs) => r.v.exists(v => xs.exists(_ == v))
    case IsNull("v") => r.v.isEmpty
    case IsNotNull("v") => r.v.isDefined
    case EqualTo("s", x: String) => r.s.contains(x)
    case GreaterThan("s", x: String) => r.s.exists(_ > x)
    case LessThan("s", x: String) => r.s.exists(_ < x)
    case StringStartsWith("s", x: String) => r.s.exists(_.startsWith(x))
    case IsNull("s") => r.s.isEmpty
    case IsNotNull("s") => r.s.isDefined
    case And(a, b) => matches(r, a) && matches(r, b)
    case Or(a, b) => matches(r, a) || matches(r, b)
    case _ => true
  }

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(2000), p)
    assert(res.passed, res.status.toString)
  }

  test("accept never prunes a file containing a matching row") {
    // rows share one partition bucket (a data file never spans buckets)
    val fileRows: Gen[List[Row]] = for {
      first <- rowGen
      rest <- Gen.listOfN(5, rowGen)
    } yield first :: rest.map(r => r.copy(p =
      spec(first.p) + java.lang.Math.floorMod(r.p, Width)))
    check(forAll(fileRows, filterGen) { (rows, f) =>
      val file = fileOf(rows)
      val anyMatch = rows.exists(matches(_, f))
      // soundness: a matching row forces acceptance
      !anyMatch || LakeStatsPruning.accept(spec, file, f)
    })
  }

  test("partition EqualTo prunes foreign buckets (effectiveness canary)") {
    val rows = List(Row(Width * 3 + 5, Some(1L), Some("a")))
    val file = fileOf(rows)
    assert(!LakeStatsPruning.accept(spec, file, EqualTo("p", Width * 7)))
    assert(LakeStatsPruning.accept(spec, file, EqualTo("p", Width * 3 + 5)))
  }

  test("TYPE WIDENING: BIGINT-typed filters prune narrow-vintage (int-stat) " +
      "files soundly AND effectively; decimal filters degrade to keep-all") {
    // narrow-vintage file metas: v written as INT32 — footerMeta's Integer
    // stats path folds int min/max into the SAME long domain the manifest
    // stores for every width, so a post-widening query (filter values now
    // java.lang.Long, possibly outside int range) must keep pruning them.
    // Soundness first: int-valued rows, long-valued filters, fuzzed.
    val intRowGen: Gen[Row] = for {
      p <- Gen.choose(0L, 10L * Width)
      v <- Gen.option(Gen.choose(-100, 100).map(_.toLong))
    } yield Row(p, v, None)
    val fileRows: Gen[List[Row]] = for {
      first <- intRowGen
      rest <- Gen.listOfN(5, intRowGen)
    } yield first :: rest.map(r => r.copy(p =
      spec(first.p) + java.lang.Math.floorMod(r.p, Width)))
    val wideFilterGen: Gen[Filter] = for {
      x <- Gen.oneOf(Gen.choose(-120L, 120L),
        Gen.choose(Int.MaxValue.toLong, Int.MaxValue.toLong + 1000000L))
      f <- Gen.oneOf[Filter](EqualTo("v", x), GreaterThan("v", x),
        GreaterThanOrEqual("v", x), LessThan("v", x), LessThanOrEqual("v", x),
        In("v", Array[Any](x, x + 3)))
    } yield f
    check(forAll(fileRows, wideFilterGen) { (rows, f) =>
      val anyMatch = rows.exists(matches(_, f))
      !anyMatch || LakeStatsPruning.accept(spec, fileOf(rows), f)
    })
    // effectiveness canaries: the widened-type filter still PRUNES on the
    // narrow file's manifest min/max — this is what keeps a mixed-vintage
    // million-file table's planning proportional to the surviving files
    // even where the parquet ROW-GROUP gate (filterTypesMatch) declines
    // the in-file predicate for vintage-mismatched physical types
    val narrow = fileOf(List(Row(5L, Some(10L), None), Row(6L, Some(20L), None)))
    assert(!LakeStatsPruning.accept(spec, narrow,
      EqualTo("v", Int.MaxValue.toLong + 5L)), "out-of-int-range needle kept")
    assert(!LakeStatsPruning.accept(spec, narrow, GreaterThan("v", 25L)))
    assert(LakeStatsPruning.accept(spec, narrow, GreaterThan("v", 15L)))
    // decimal widening: filter values are java.math.BigDecimal — outside
    // the long/string stat domains, so pruning degrades to KEEP (sound:
    // the manifest's unscaled int stats must never compare against a
    // scaled decimal needle)
    assert(LakeStatsPruning.accept(spec, narrow,
      EqualTo("v", new java.math.BigDecimal("999999.99"))))
  }
}
