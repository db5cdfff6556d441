package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: probe a broadcast [[BloomFilter]] with a
  * 64-bit hash. This is the hot path of bloom-pruned decontamination
  * ([[graft.llm.TextAnalysis.contaminationBloom]]): at 100 TB the probe
  * runs once per corpus shingle, so it must stay inside whole-stage
  * codegen — a Scala UDF there forces an eval-interpreter boundary and
  * per-row boxing on the single largest scan of the job. Spark's
  * `functions._` surface exposes no `might_contain` (the internal
  * `BloomFilterMightContain` used by runtime row-group filtering expects
  * a serialized filter from a scalar subquery), hence this expression:
  * the broadcast handle rides along as a codegen reference object and
  * the generated Java calls `mightContainLong` directly — one virtual
  * call per row, no boxing, fused into the enclosing codegen stage.
  *
  * Blooms have no false negatives, so filtering with this expression is
  * lossless for any downstream exact join (false positives are removed
  * by the join itself).
  */
case class BloomMightContain(child: Expression,
    bloom: Broadcast[BloomFilter]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects bigint, got ${child.dataType.simpleString}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(h: Any): Any =
    bloom.value.mightContainLong(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val bfClass = classOf[BloomFilter].getName
    // raw Broadcast reference (generics are erased in generated Java);
    // value() resolves the executor-local copy once per call site
    val ref = ctx.addReferenceObj("bloomBcast", bloom,
      classOf[Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = (($bfClass) $ref.value()).mightContainLong($h);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object BloomMightContain {
  /** DataFrame-API entry point: `probe(col, bcastFilter)`. */
  def probe(hash: Column, bloom: Broadcast[BloomFilter]): Column =
    GraftShims.column(
      BloomMightContain(GraftShims.expression(hash), bloom))
}
