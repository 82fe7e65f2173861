package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) curve key for multi-dimensional clustering: each
  * dimension is linearly scaled into `bitsPerDim` buckets using its
  * known min/max, then the bucket bits interleave high-to-low into one
  * long. Sorting by the key clusters rows so that a range predicate on
  * ANY of the dimensions touches a bounded band of the sort order —
  * the property that makes post-compaction file stats prune on every
  * z-ordered column, not just the first of a lexicographic sort.
  *
  * Pure Column composition (shift/mask/or) — stays inside whole-stage
  * codegen, no UDF. Min/max come from manifest stats at compaction time,
  * so no extra data pass; out-of-range values clamp to the edge buckets
  * (ordering stays correct, only clustering quality degrades).
  */
object ZOrder {

  /** cols: (column, statMin, statMax) per dimension; at most
    * 64 / bitsPerDim dimensions fit in the long key.
    */
  def zvalue(cols: Seq[(Column, Long, Long)], bitsPerDim: Int = 8): Column = {
    require(cols.nonEmpty, "zvalue needs at least one column")
    require(cols.size * bitsPerDim <= 63,
      s"${cols.size} dims x $bitsPerDim bits exceed the long key")
    val maxBucket = (1L << bitsPerDim) - 1
    val buckets = cols.map { case (c, mn, mx) =>
      val span = math.max(1.0, (mx - mn + 1).toDouble)
      least(lit(maxBucket), greatest(lit(0L),
        floor((c.cast("double") - lit(mn.toDouble)) *
          ((maxBucket + 1).toDouble / span)).cast("long")))
    }
    (bitsPerDim - 1 to 0 by -1).foldLeft(lit(0L)) { (z, bit) =>
      buckets.foldLeft(z) { (acc, b) =>
        shiftleft(acc, 1).bitwiseOR(shiftright(b, bit).bitwiseAND(lit(1L)))
      }
    }
  }
}
