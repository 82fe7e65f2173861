package graft.lake.dsv2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructType}

/** The laketable partition transform as a catalog-resolvable V2 function.
  *
  * Storage-partitioned joins need Catalyst to *understand* the partition
  * transform: the scan reports `KeyGroupedPartitioning(truncate_<w>(col))`
  * and the analyzer resolves the named transform through the table's
  * [[org.apache.spark.sql.connector.catalog.FunctionCatalog]]. Two scans
  * whose resolved transforms share `canonicalName` are co-partitioned,
  * which is what lets a join of two laketables on the partition column run
  * with NO shuffle on either side — at 100 TB the difference between a
  * metadata-aligned zip join and re-shuffling both inputs.
  *
  * The bucket width is embedded in the FUNCTION NAME, not passed as an
  * argument: Catalyst's key-grouping only supports transforms with exactly
  * one child, and that child must be a column reference
  * (KeyGroupedPartitioning.supportsExpressions) — a literal width argument
  * silently disqualifies the whole partitioning. `canonicalName` carries
  * the width too, so tables with different widths are never treated as
  * co-partitioned. Semantics identical to [[graft.lake.TruncateSpec.apply]]
  * (floor to fixed-width buckets, reference Constants.java:25,33-35).
  */
object TruncateFunction {
  private val Prefix = "truncate_"

  def nameFor(widthMicros: Long): String = s"$Prefix$widthMicros"

  /** Parse "truncate_<width>" back to the width; None for other names. */
  def widthOf(functionName: String): Option[Long] =
    if (functionName.toLowerCase.startsWith(Prefix))
      functionName.substring(Prefix.length).toLongOption.filter(_ > 0)
    else None

  final class Unbound(widthMicros: Long) extends UnboundFunction {
    require(widthMicros > 0, "truncate width must be positive")

    override def name(): String = nameFor(widthMicros)
    override def description(): String =
      s"${name()}(col): floor a BIGINT to $widthMicros-wide buckets " +
        "(the laketable partition transform)"

    override def bind(inputType: StructType): BoundFunction = {
      val ok = inputType.fields.length == 1 &&
        (inputType.fields.head.dataType == LongType ||
          inputType.fields.head.dataType == IntegerType)
      if (!ok) throw new UnsupportedOperationException(
        s"${name()} expects one BIGINT column; got ${inputType.simpleString}")
      new Bound(widthMicros)
    }
  }

  final class Bound(width: Long) extends ScalarFunction[java.lang.Long] {
    override def inputTypes(): Array[DataType] = Array(LongType)
    override def resultType(): DataType = LongType
    override def isResultNullable: Boolean = false
    override def name(): String = nameFor(width)
    override def canonicalName(): String = s"laketable.truncate[$width]"

    /** Magic-method fast path (ScalarFunction.MAGIC_METHOD_NAME): Spark
      * compiles a direct call instead of boxing through produceResult.
      */
    def invoke(value: Long): Long =
      value - java.lang.Math.floorMod(value, width)

    override def produceResult(input: InternalRow): java.lang.Long =
      invoke(input.getLong(0))
  }
}
