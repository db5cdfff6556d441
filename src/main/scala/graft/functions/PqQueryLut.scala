package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the per-query PQ ADC lookup table:
  * `lut[m][k] = dot(vn[m*sub .. m*sub+sub), cb[m][k])` over the
  * normalized query vector. Replaces the interpreted
  * `transform(sequence, m -> transform(sequence, k -> aggregate(...)))`
  * chain whose codebook rode as a multi-kilobyte parsed SQL literal —
  * every query construction re-parsed and re-analyzed the literal tree
  * (numSub x codebookSize x subDim nested array() calls), and every row
  * walked three interpreted element_at calls per (m, k, i). The codebook
  * here is a reference object (like [[RhpBuckets]]' plane matrix) and
  * the evaluation one fused loop inside whole-stage codegen.
  *
  * Arithmetic is bit-identical to the HOF it replaces: per (m, k) a
  * sequential index-order fold `a + vn[m*sub+i] * cb[m][k][i]`. A null
  * vector element nulls that (m, k) entry (the HOF's null propagation
  * through the running sum); a vector shorter than numSub*sub yields
  * null entries for the out-of-range subspaces.
  *
  * Output: array<array<double>> of numSub x codebookSize entries.
  */
case class PqQueryLut(child: Expression, cb: Array[Array[Array[Double]]])
    extends UnaryExpression {
  require(cb.nonEmpty && cb.forall(_.nonEmpty))

  private val numSub = cb.length
  private val ksz = cb(0).length
  private val sub = cb(0)(0).length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"pq_query_lut expects array<double> input, got ${dt.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = true),
      containsNull = false)
  override def prettyName: String = "pq_query_lut"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val d = x.numElements()
    val out = new Array[ArrayData](numSub)
    var m = 0
    while (m < numSub) {
      val row = new Array[Any](ksz)
      var k = 0
      while (k < ksz) {
        val c = cb(m)(k)
        var s: java.lang.Double = 0.0
        if (m * sub + sub > d) s = null
        else {
          var acc = 0.0
          var bad = false
          var i = 0
          while (i < sub && !bad) {
            if (x.isNullAt(m * sub + i)) bad = true
            else acc += x.getDouble(m * sub + i) * c(i)
            i += 1
          }
          s = if (bad) null else acc
        }
        row(k) = s
        k += 1
      }
      out(m) = new GenericArrayData(row)
      m += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val mat = ctx.addReferenceObj("cb", cb, "double[][][]")
      val d = ctx.freshName("d")
      val out = ctx.freshName("out")
      val row = ctx.freshName("row")
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
        int $d = $x.numElements();
        Object[] $out = new Object[$numSub];
        for (int $m = 0; $m < $numSub; $m++) {
          Object[] $row = new Object[$ksz];
          for (int $k = 0; $k < $ksz; $k++) {
            double[] $c = $mat[$m][$k];
            if ($m * $sub + $sub > $d) {
              $row[$k] = null;
            } else {
              double $acc = 0.0;
              boolean $bad = false;
              for (int $i = 0; $i < $sub && !$bad; $i++) {
                if ($x.isNullAt($m * $sub + $i)) { $bad = true; break; }
                $acc += $x.getDouble($m * $sub + $i) * $c[$i];
              }
              $row[$k] = $bad ? null : (Object) Double.valueOf($acc);
            }
          }
          $out[$m] = new org.apache.spark.sql.catalyst.util.GenericArrayData($row);
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqQueryLut {
  /** DataFrame-API entry point (input cast to array<double>). */
  def queryLut(vn: Column, cb: Array[Array[Array[Double]]]): Column =
    GraftShims.column(PqQueryLut(
      GraftShims.expression(vn.cast("array<double>")), cb))
}
