package graft.lake

import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

/** Delta-encoded snapshot manifest lists (Json.metaToJson): the metadata
  * file must be O(snapshots + changes), not O(snapshots × manifests), and
  * the encoding must be invisible — round-trips are exact for arbitrary
  * commit histories, legacy inline metadata still parses, and a delta
  * whose parent was expired re-inlines.
  */
class MetadataDeltaSpec extends AnyFunSuite {

  private def snap(id: Long, parent: Long, op: String, ms: Seq[String],
      dms: Seq[String] = Nil): Snapshot =
    Snapshot(id, parent, 1000L + id, op, ms, Some("id BIGINT"), dms)

  private def meta(snaps: Seq[Snapshot]): TableMeta =
    TableMeta(1, "/tmp/t", "id BIGINT", TruncateSpec("id", 10L),
      Map("k" -> "v"), snaps, snaps.lastOption.map(_.id).getOrElse(-1L))

  /** Random commit histories through the shapes real commits produce:
    * append (parent list + 1), rewrite (single fresh manifest), delete
    * (parent delete list + 1), expire (subset retained, parents possibly
    * gone), manifest merge (many removed, one added).
    */
  private val genHistory: Gen[Seq[Snapshot]] = {
    val genOp = Gen.frequency(
      5 -> "append", 2 -> "rewrite", 2 -> "delete", 1 -> "merge")
    Gen.listOfN(20, genOp).map { ops =>
      var id = 0L
      var mcount = 0
      var snaps = Vector(snap(0L, -1L, "create", Nil))
      ops.foreach { op =>
        id += 1
        val p = snaps.last
        def fresh(): String = { mcount += 1; s"manifest-$mcount.json" }
        val s = op match {
          case "append" => snap(id, p.id, "append",
            p.manifests :+ fresh(), p.deleteManifests)
          case "rewrite" => snap(id, p.id, "rewrite",
            Seq(fresh()), p.deleteManifests)
          case "delete" => snap(id, p.id, "delete", p.manifests,
            p.deleteManifests :+ { mcount += 1; s"delete-manifest-$mcount.json" })
          case "merge" => snap(id, p.id, "append",
            (if (p.manifests.size > 2) Seq(fresh())
             else p.manifests :+ fresh()), p.deleteManifests)
        }
        snaps :+= s
      }
      snaps
    }
  }

  test("round-trip is exact over random commit histories") {
    val prop = forAll(genHistory) { snaps =>
      val m = meta(snaps)
      Json.metaFromJson(Json.metaToJson(m)) == m
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("round-trip survives expiry holes (delta parent gone, re-inlined)") {
    // 0..9 appends, then expire drops 1..4: snapshot 5's parent (4) is
    // gone from the serialized set, so the writer must inline its list
    var snaps = Vector(snap(0L, -1L, "create", Nil))
    for (i <- 1 to 9)
      snaps :+= snap(i, i - 1, "append",
        snaps.last.manifests :+ s"manifest-$i.json")
    val retained = meta(snaps.filter(s => s.id == 0 || s.id >= 5))
    assert(Json.metaFromJson(Json.metaToJson(retained)) == retained)
  }

  test("metadata size is linear in commits, not quadratic") {
    def chain(n: Int): TableMeta = {
      var snaps = Vector(snap(0L, -1L, "create", Nil))
      for (i <- 1 to n)
        snaps :+= snap(i, i - 1, "append",
          snaps.last.manifests :+ f"manifest-${java.util.UUID.randomUUID()}.json")
      meta(snaps)
    }
    val s100 = Json.metaToJson(chain(100)).length
    val s200 = Json.metaToJson(chain(200)).length
    // inline lists would give s200 ≈ 4 × s100 (quadratic); deltas ≈ 2×
    assert(s200 < s100 * 3,
      s"metadata grew super-linearly: $s100 -> $s200 bytes")
    // and the absolute size is one manifest name per commit, not n²/2
    assert(s200 < 200 * 400, s"0.2k commits cost $s200 bytes of metadata")
  }

  test("legacy inline metadata (pre-delta format) parses unchanged") {
    val legacy =
      """{"formatVersion":1,"location":"/tmp/t","schemaDdl":"id BIGINT",
        |"spec":{"column":"id","widthMicros":10},
        |"properties":{"k":"v"},
        |"snapshots":[
        |  {"id":0,"parentId":-1,"timestampMs":1000,"operation":"create",
        |   "manifests":[]},
        |  {"id":1,"parentId":0,"timestampMs":1001,"operation":"append",
        |   "manifests":["manifest-a.json"],
        |   "deleteManifests":["delete-manifest-b.json"]}],
        |"currentSnapshotId":1}""".stripMargin
    val m = Json.metaFromJson(legacy)
    assert(m.snapshots.map(_.manifests) == Seq(Nil, Seq("manifest-a.json")))
    assert(m.snapshots.last.deleteManifests == Seq("delete-manifest-b.json"))
  }
}
