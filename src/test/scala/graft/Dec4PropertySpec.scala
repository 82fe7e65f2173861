package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test for the oracle double convention (Tables.dec4): the
  * round(x,4) → DECIMAL(28,4) → DOUBLE pipeline must equal HALF_UP rounding
  * of the double's SHORTEST decimal repr (BigDecimal.valueOf semantics) —
  * that is the exact convention the DuckDB oracle SQL mirrors, and every one
  * of the 62 hash-compared queries rests on it. Inputs concentrate on the
  * hard cases: values at/near k/10⁴ rounding boundaries and classic
  * x.xxx5 near-ties (2.675-style, where the binary value sits just below
  * the decimal tie), within the |x| ≲ 9e11 domain where the 10⁴-scaled
  * unscaled value stays below 2^53 (see the dec4 scaladoc bound).
  */
class Dec4PropertySpec extends SparkSpec {

  private def model(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  test("dec4 equals shortest-repr HALF_UP rounding, bit-exact, across the oracle domain") {
    val uniform = Gen.choose(-9.0e11, 9.0e11)
    val nearBoundary = for {
      k <- Gen.choose(-2000000000L, 2000000000L)
      jitter <- Gen.oneOf(0.0, 5e-5, -5e-5, 4.9999e-5, 5.0001e-5)
    } yield k / 10000.0 + jitter
    val classicTies =
      Gen.choose(-10000000L, 10000000L).map(k => k / 1000.0 + 0.0005)
    val g = Gen.frequency(2 -> uniform, 3 -> nearBoundary, 2 -> classicTies)
    // one deterministic batch, evaluated in a single Spark job (a job per
    // scalacheck sample would take minutes)
    val values: List[Double] =
      Gen.listOfN(4000, g).apply(Gen.Parameters.default, Seed(20260812L)).get

    import spark.implicits._
    val out = values.toDF("x")
      .select(Tables.dec4(col("x")).as("y"))
      .collect().map(_.getDouble(0))
    values.zip(out).foreach { case (x, y) =>
      val expected = model(x)
      assert(
        java.lang.Double.doubleToLongBits(y) ==
          java.lang.Double.doubleToLongBits(expected),
        s"dec4($x) = $y, expected $expected")
    }
  }
}
