package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StructField, StructType}

/** Frozen two-level quantizer model for [[HierAssign]]: the coarse
  * regions, each region's routed fine-centroid candidates, and the
  * per-region fallback seed. A few-hundred-KB driver object shipped once
  * per task via the expression's reference-object slot — NOT inlined into
  * generated code, so the expression stays inside whole-stage codegen at
  * any K (a literal `when`-chain over K=100 candidates blows the 64 KB
  * generated-method limit and forfeits WSCG for the whole projection).
  */
final class HierAssignModel(
    val coarse: Array[(Long, Array[Float])],
    val candidates: Map[Long, Array[(Long, Array[Float])]],
    val seeds: Map[Long, Long]) extends Serializable {

  /** CosineSimilarity's exact arithmetic (per-element double widening,
    * same accumulation order) — bit-identical scores are what lets the
    * PipelineSpec assert row-for-row agreement with the batch
    * `assignCellsHier` dataflow. */
  private def cos(x: ArrayData, y: Array[Float]): Double = {
    val n = math.min(x.numElements(), y.length)
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  /** Catalyst's double ordering (UnsafeRow/struct-max semantics): NaN
    * equals NaN and exceeds everything else; -0.0 == 0.0. Replicated so
    * the argmax — including exact-tie and NaN corners — matches the
    * batch path's `max(struct(s, c))` / `array_max` decision. */
  private def cmp(a: Double, b: Double): Int = {
    val an = java.lang.Double.isNaN(a); val bn = java.lang.Double.isNaN(b)
    if ((an && bn) || a == b) 0
    else if (an) 1
    else if (bn) -1
    else if (a > b) 1 else -1
  }

  /** (cell, csim) for one embedding: coarse argmax over the regions,
    * then argmax over the winning region's routed candidates, seed
    * fallback when the region routed none — the identical decision
    * procedure as the batch join/groupBy dataflow, as two tight loops.
    */
  def assign(emb: ArrayData): InternalRow = {
    var bestR = 0L; var bestRs = Double.NaN; var first = true
    var i = 0
    while (i < coarse.length) {
      val s = cos(emb, coarse(i)._2)
      val c = coarse(i)._1
      if (first || { val d = cmp(s, bestRs); d > 0 || (d == 0 && c > bestR) }) {
        bestR = c; bestRs = s; first = false
      }
      i += 1
    }
    val cands = candidates.getOrElse(bestR, HierAssignModel.NoCands)
    if (cands.isEmpty) return InternalRow(seeds(bestR), bestRs)
    var bc = 0L; var bs = Double.NaN; var none = true
    i = 0
    while (i < cands.length) {
      val s = cos(emb, cands(i)._2)
      val c = cands(i)._1
      if (none || { val d = cmp(s, bs); d > 0 || (d == 0 && c > bc) }) {
        bc = c; bs = s; none = false
      }
      i += 1
    }
    InternalRow(bc, bs)
  }
}

object HierAssignModel {
  private val NoCands = Array.empty[(Long, Array[Float])]

  def apply(cents: Array[(Long, Seq[Float])],
      coarse: Array[(Long, Seq[Float])],
      routed: Map[Long, Array[Long]],
      seeds: Map[Long, Long]): HierAssignModel = {
    val centVec = cents.map { case (c, v) => c -> v.toArray }.toMap
    new HierAssignModel(
      coarse.map { case (r, v) => (r, v.toArray) },
      routed.map { case (r, cs) => r -> cs.map(c => (c, centVec(c))) },
      seeds)
  }
}

/** Native codegen'd two-level (hierarchical) cell assignment (SURVEY D1;
  * custom-op preference order (b)): `struct(cell BIGINT, csim DOUBLE)`
  * from an `array<float>` embedding under a frozen [[HierAssignModel]].
  * The model rides `ctx.addReferenceObj`, so generated code is a single
  * virtual call — the projection stays inside whole-stage codegen where
  * the equivalent literal expression tree (√K + routed-candidate cosine
  * structs, K=100 ⇒ ~110 inlined 64-float literals) trips the 64 KB
  * method limit and drops the whole stage to interpreted eval.
  */
case class HierAssign(child: Expression, model: HierAssignModel)
  extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"embedding must be array<float>, got $t")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("cell", LongType, nullable = false),
    StructField("csim", DoubleType, nullable = false)))
  override def prettyName: String = "hier_assign"

  override def nullSafeEval(input: Any): Any =
    model.assign(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("hierModel", model,
      classOf[HierAssignModel].getName)
    nullSafeCodeGen(ctx, ev, emb =>
      s"${ev.value} = $modelRef.assign($emb);")
  }

  override protected def withNewChildInternal(newChild: Expression): HierAssign =
    copy(child = newChild)
}

object HierAssign {
  // Column's Expression constructor is private to Spark, so the Column
  // bridge goes through the session function registry (the
  // CosineSimilarity route). The model itself can't ride a SQL literal —
  // it parks in this map under a UUID key that does; the builder resolves
  // it at analysis. One entry (~K·dim floats, tens of KB) is minted per
  // gate/assignment CONSTRUCTION (not per row/micro-batch: streaming
  // analyzes the plan once per run). Bounded as an access-ordered LRU so
  // a long-lived service constructing thousands of gates can't grow it
  // without limit: once the builder has resolved, the EXPRESSION holds
  // the model — the map entry only needs to survive the window between
  // Column creation and analysis, and re-analysis recreates the Column
  // (a fresh key) in every engine path, so evicting cold entries is safe.
  private val MaxModels = 64
  private val models = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, HierAssignModel](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, HierAssignModel]): Boolean =
        size() > MaxModels
    })

  private val ident =
    org.apache.spark.sql.catalyst.FunctionIdentifier("hier_assign")

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[HierAssign].getName, "hier_assign"),
        (children: Seq[Expression]) => {
          require(children.size == 2,
            "hier_assign takes (embedding, model-key)")
          val key = children(1) match {
            case org.apache.spark.sql.catalyst.expressions
                .Literal(k: org.apache.spark.unsafe.types.UTF8String, _) =>
              k.toString
            case other => throw new IllegalArgumentException(
              s"hier_assign model key must be a string literal, got $other")
          }
          val model = models.get(key)
          require(model != null, s"no HierAssignModel registered under $key")
          HierAssign(children.head, model)
        })
    }
  }

  /** `struct(cell, csim)` Column for `embedding` under `model`. */
  def column(embedding: Column, model: HierAssignModel): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    register(spark)
    val key = java.util.UUID.randomUUID().toString
    models.put(key, model)
    org.apache.spark.sql.functions.call_function(
      "hier_assign", embedding, org.apache.spark.sql.functions.lit(key))
  }
}
