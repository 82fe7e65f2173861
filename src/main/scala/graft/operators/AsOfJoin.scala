package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable as-of join (SURVEY B15, D6).
  *
  * The naive formulation — non-equi join on `r.time <= l.time` then
  * groupBy-max — explodes quadratically per key (every left row matches
  * every earlier right row before the aggregate throws the work away).
  * This operator computes the same result with the union + ordered-window
  * algorithm: tag both sides, hash-partition by key, sort by (time, tag),
  * and carry the latest right timestamp forward with a running max — ONE
  * shuffle, O(n log n) per partition, no intermediate blowup. At equal
  * timestamps the right side sorts first, making the match inclusive
  * (right.time <= left.time), matching the join formulation exactly.
  */
object AsOfJoin {

  /** For each left row, the latest `rightTime` at-or-before `leftTime`
    * within the same key. Output: left columns + `asofCol` (null when no
    * earlier right row exists).
    *
    * @param left      probe side, must contain `key` and `leftTime`
    * @param right     quote side, must contain `key` and `rightTime`
    * @param key       equi-join key column name (present in both)
    * @param leftTime  event-time column on the left (long, e.g. epoch µs)
    * @param rightTime event-time column on the right (long)
    * @param asofCol   output column name for the matched right time
    */
  def latestAtOrBefore(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, asofCol: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.select(
      col(key).as("__k"), col(leftTime).cast("long").as("__t"),
      lit(1).as("__side"), struct(leftCols.map(col): _*).as("__row"))
    val r = right
      // SQL equi-join semantics: a NULL key never matches anything — drop
      // NULL-key right rows so they can't pair with NULL-key left rows
      // through the window partition (which groups NULLs together)
      .filter(col(key).isNotNull)
      .select(
        col(key).as("__k"), col(rightTime).cast("long").as("__t"),
        lit(0).as("__side"), lit(null).cast(l.schema("__row").dataType).as("__row"))
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(asofCol, max(when(col("__side") === 0, col("__t"))).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__row.$c").as(c)) :+ col(asofCol): _*)
  }
}
