package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression for the PQ asymmetric-distance (ADC) table
  * scan: `sum over m of lut[m][codes[m]]` — the per-corpus-row inner loop
  * of the product-quantization probe (graft.llm.Similarity.cosineTopKPq,
  * the s11/st09 serving paths). Replaces the interpreted
  * `aggregate(sequence(1, numSub), 0D, (a, m) -> a +
  * element_at(element_at(lut, m), element_at(codes, m) + 1))`
  * higher-order-function chain, which materialized a sequence array and
  * walked three interpreted element_at calls per subspace PER SCORED
  * PAIR; this compiles to a tight indexed loop over the unsafe array
  * data inside whole-stage codegen.
  *
  * Accumulation is sequential over m with double adds — bit-identical to
  * the HOF's left fold, so ADC candidate sets (and therefore the exact
  * re-ranked output) are unchanged. Any out-of-range or null code, or a
  * codes array shorter than the lut, yields null — the value the HOF
  * produced via element_at's null propagation into the running sum.
  */
case class PqAdcScore(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val lutOk = left.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    val codesOk = right.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (lutOk && codesOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_adc_score expects (array<array<double>>, array<int>), got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  // OOB / short / null codes yield null even for non-nullable children
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_score"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val lut = l.asInstanceOf[ArrayData]
    val codes = r.asInstanceOf[ArrayData]
    val m = lut.numElements()
    if (codes.numElements() < m) return null
    var s = 0.0
    var i = 0
    while (i < m) {
      if (lut.isNullAt(i) || codes.isNullAt(i)) return null
      val inner = lut.getArray(i)
      val code = codes.getInt(i)
      if (code < 0 || code >= inner.numElements() || inner.isNullAt(code))
        return null
      s += inner.getDouble(code)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val inner = ctx.freshName("inner")
      val code = ctx.freshName("code")
      val bad = ctx.freshName("bad")
      s"""
        int $m = $l.numElements();
        if ($r.numElements() < $m) {
          ${ev.isNull} = true;
        } else {
          double $s = 0.0;
          boolean $bad = false;
          for (int $i = 0; $i < $m && !$bad; $i++) {
            if ($l.isNullAt($i) || $r.isNullAt($i)) { $bad = true; break; }
            org.apache.spark.sql.catalyst.util.ArrayData $inner =
              $l.getArray($i);
            int $code = $r.getInt($i);
            if ($code < 0 || $code >= $inner.numElements() ||
                $inner.isNullAt($code)) { $bad = true; break; }
            $s += $inner.getDouble($code);
          }
          if ($bad) {
            ${ev.isNull} = true;
          } else {
            ${ev.value} = $s;
          }
        }
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object PqAdcScore {
  /** DataFrame-API entry point: `lut` array<array<double>>, `codes`
    * array<int>. */
  def adcScore(lut: Column, codes: Column): Column =
    GraftShims.column(PqAdcScore(
      GraftShims.expression(lut), GraftShims.expression(codes)))
}
