package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL registration for Spark's own bloom-filter sketch expressions.
  *
  * `BloomFilterAggregate` / `BloomFilterMightContain` are the exact
  * expressions Spark's runtime row-level filtering injects for shuffle
  * pruning, but they are not exposed in the public function registry.
  * Registering them gives the pipeline the canonical 100 TB
  * decontamination shape: aggregate a bounded reference set (benchmark
  * n-grams) into a fixed-size bitmap, broadcast the BYTES — not the rows
  * — and prefilter the corpus map-side before any join. The aggregate is
  * a normal partial+final agg (per-partition bitmaps OR-merged), and the
  * membership probe stays inside whole-stage codegen.
  *
  *   - `bloom_filter_agg(xxhash64(x), estimatedItems, numBits)` → binary
  *   - `might_contain(bloomBinary, xxhash64(x))` → boolean
  */
object BloomFunctions {

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val agg = FunctionIdentifier("bloom_filter_agg")
    if (!registry.functionExists(agg)) {
      registry.registerFunction(
        agg,
        new ExpressionInfo(classOf[BloomFilterAggregate].getName, "bloom_filter_agg"),
        (children: Seq[Expression]) => children match {
          case Seq(c) => new BloomFilterAggregate(c)
          case Seq(c, items) => new BloomFilterAggregate(c, items)
          case Seq(c, items, bits) => new BloomFilterAggregate(c, items, bits)
          case _ => throw new IllegalArgumentException(
            "bloom_filter_agg takes 1 to 3 arguments")
        })
    }
    val mc = FunctionIdentifier("might_contain")
    if (!registry.functionExists(mc)) {
      registry.registerFunction(
        mc,
        new ExpressionInfo(classOf[BloomFilterMightContain].getName, "might_contain"),
        (children: Seq[Expression]) => {
          require(children.size == 2, "might_contain takes exactly 2 arguments")
          BloomFilterMightContain(children.head, children(1))
        })
    }
  }
}
