package graft.lake

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the truncate partition transform (SURVEY §5.3):
  * idempotent, monotone, bucket-aligned across the epoch-µs domain —
  * including negatives, where the reference's plain `v - v % w` would
  * mis-bucket. Domain is bounded away from Long.MinValue: the floor bucket
  * start of values within one width of MinValue is not representable.
  */
class TruncatePropertySpec extends AnyFunSuite {
  private val spec = TruncateSpec("ts", 300000000L)
  // ±~292,000 years around the epoch in µs — the meaningful timestamp domain
  private val micros: Gen[Long] =
    Gen.choose(Long.MinValue + spec.widthMicros, Long.MaxValue)

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.passed, res.status.toString)
  }

  test("truncate is idempotent") {
    check(forAll(micros) { v => spec(spec(v)) == spec(v) })
  }

  test("truncate is monotone") {
    check(forAll(micros, micros) { (a, b) =>
      if (a <= b) spec(a) <= spec(b) else spec(a) >= spec(b)
    })
  }

  test("truncate floors to a bucket boundary at or below the value") {
    check(forAll(micros) { v =>
      val t = spec(v)
      t <= v && v - t < spec.widthMicros &&
        java.lang.Math.floorMod(t, spec.widthMicros) == 0
    })
  }

  test("string stat truncation preserves bound direction") {
    // manifest string stats are harvested ASCII-only (LakeWriter.footerMeta)
    val ascii: Gen[String] = Gen.listOf(Gen.choose(' ', '~')).map(_.mkString)
    check(forAll(ascii) { s =>
      val lo = ColStats.truncateLower(s)
      lo <= s && lo.length <= ColStats.TruncLen &&
        ColStats.truncateUpper(s).forall(hi =>
          hi >= s && hi.length <= ColStats.TruncLen)
    })
  }

  test("matches the reference transform for non-negative values") {
    // Constants.java:33-35 — value - (value % width) for positive µs
    check(forAll { (v: Long) =>
      val nn = math.abs(v % 1000000000000L)
      spec(nn) == nn - (nn % spec.widthMicros)
    })
  }
}
