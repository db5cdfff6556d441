package graft.functions

import org.apache.spark.sql.{Column, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two double arrays in a
  * single fused pass (dot product + both norms in one loop), with
  * whole-stage codegen. Replaces the 3-pass `aggregate`/`zip_with`
  * higher-order-function formulation in the embedding operators — HOFs
  * evaluate a lambda per element through the interpreter, this compiles to
  * a tight Java loop over the unsafe array data (SURVEY §7.3: custom
  * Expression where built-ins can't express the op efficiently).
  *
  * Arithmetic is exactly `dot / sqrt(normA * normB)` with sequential
  * index-order accumulation — bit-identical to the HOF formulation and to
  * engines that fold left-to-right, so oracle comparisons are stable.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity expects array<double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  // a zero-norm input yields null even when both children are non-nullable
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // dimension mismatch -> null, same as the zip_with/aggregate HOF
    // formulation (silent truncation would mask embedding-dim bugs)
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null else dot / math.sqrt(nx * ny)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        if ($x.numElements() != $y.numElements()) {
          ${ev.isNull} = true;
        } else {
          int $n = $x.numElements();
          double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double $xi = $x.getDouble($i);
            double $yi = $y.getDouble($i);
            $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
          }
          if ($nx == 0.0 || $ny == 0.0) {
            ${ev.isNull} = true;
          } else {
            ${ev.value} = $dot / java.lang.Math.sqrt($nx * $ny);
          }
        }
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** DataFrame-API entry point (inputs are cast to array<double>). */
  def cosineSim(a: Column, b: Column): Column =
    GraftShims.column(CosineSimilarity(
      GraftShims.expression(a.cast("array<double>")),
      GraftShims.expression(b.cast("array<double>"))))

  /** SQL registration: `cosine_similarity(a, b)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity",
      exprs => CosineSimilarity(Cast(exprs(0), ArrayType(DoubleType)),
        Cast(exprs(1), ArrayType(DoubleType))), "built-in")
}
