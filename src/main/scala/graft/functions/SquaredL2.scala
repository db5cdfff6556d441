package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: squared L2 distance of two double arrays
  * in one fused codegen'd loop. Replaces the
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0D, +)` higher-order
  * formulation in the PQ codebook trainer (interpreted lambda per
  * element). Sequential index-order accumulation — bit-identical to the
  * HOF fold. A dimension mismatch yields null (zip_with's null-padding
  * makes the HOF sum null there too). */
case class SquaredL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"squared_l2 expects array<double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "squared_l2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
        if ($x.numElements() != $y.numElements()) {
          ${ev.isNull} = true;
        } else {
          int $n = $x.numElements();
          double $s = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double $d = $x.getDouble($i) - $y.getDouble($i);
            $s += $d * $d;
          }
          ${ev.value} = $s;
        }
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Long-typed sibling for the fixed-point integer k-means: squared L2
  * over array<long> with Long arithmetic. Overflow THROWS (via
  * Math.multiplyExact/addExact), matching the ANSI-mode semantics of the
  * column-arithmetic formulation it replaces — silent wraparound would
  * let a distance comparison silently pick the wrong centroid. */
case class SquaredL2Long(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"squared_l2_long expects array<bigint> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "squared_l2_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      val d = Math.subtractExact(x.getLong(i), y.getLong(i))
      s = Math.addExact(s, Math.multiplyExact(d, d))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
        if ($x.numElements() != $y.numElements()) {
          ${ev.isNull} = true;
        } else {
          int $n = $x.numElements();
          long $s = 0L;
          for (int $i = 0; $i < $n; $i++) {
            long $d = java.lang.Math.subtractExact($x.getLong($i), $y.getLong($i));
            $s = java.lang.Math.addExact($s, java.lang.Math.multiplyExact($d, $d));
          }
          ${ev.value} = $s;
        }
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object SquaredL2 {
  /** DataFrame-API entry point (inputs cast to array<double>). */
  def squaredL2(a: Column, b: Column): Column =
    GraftShims.column(SquaredL2(
      GraftShims.expression(a.cast("array<double>")),
      GraftShims.expression(b.cast("array<double>"))))

  /** Long-typed entry point (inputs must already be array<bigint>). */
  def squaredL2Long(a: Column, b: Column): Column =
    GraftShims.column(SquaredL2Long(
      GraftShims.expression(a), GraftShims.expression(b)))
}
