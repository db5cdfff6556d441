package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: all random-hyperplane LSH band buckets of
  * one embedding in a single fused pass. The previous formulation inlined
  * one `aggregate(zip_with(v, plane), ...)` higher-order call PER PLANE —
  * 640 interpreted lambda chains per row at the d11 default (64 bands x
  * 10 rows), which cost ~50 s on the sf0.1 corpus. This compiles to one
  * tight loop over the plane matrix (a reference object, not 640 literal
  * arrays serialized into the task binary) and whole-stage codegen.
  *
  * Arithmetic is bit-identical to the HOF formulation: per plane a
  * sequential index-order dot product, sign bit `dot > 0`, bits packed
  * little-endian per band (`1L << r`). A dimension mismatch between the
  * vector and a plane reproduces the zip_with null semantics: that
  * plane's dot is null, its sign bit 0.
  *
  * Output: array<long> of `planes.length / rowsPerBand` bucket ids, band
  * order — callers posexplode to (band, bucket).
  */
case class RhpBuckets(child: Expression, planes: Array[Array[Double]],
    rowsPerBand: Int) extends UnaryExpression {
  require(rowsPerBand >= 1 && rowsPerBand <= 63 &&
    planes.length % rowsPerBand == 0)

  private val numBands = planes.length / rowsPerBand

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"rhp_buckets expects array<double> input, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rhp_buckets"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val d = x.numElements()
    val out = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var bucket = 0L
      var r = 0
      while (r < rowsPerBand) {
        val p = planes(b * rowsPerBand + r)
        if (p.length == d) {
          var dot = 0.0
          var i = 0
          while (i < d) { dot += x.getDouble(i) * p(i); i += 1 }
          if (dot > 0) bucket |= 1L << r
        }
        r += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val mat = ctx.addReferenceObj("planes", planes, "double[][]")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val r = ctx.freshName("r")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val p = ctx.freshName("p")
      val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket")
      s"""
        int $d = $x.numElements();
        long[] $out = new long[$numBands];
        for (int $b = 0; $b < $numBands; $b++) {
          long $bucket = 0L;
          for (int $r = 0; $r < $rowsPerBand; $r++) {
            double[] $p = $mat[$b * $rowsPerBand + $r];
            if ($p.length == $d) {
              double $dot = 0.0;
              for (int $i = 0; $i < $d; $i++) {
                $dot += $x.getDouble($i) * $p[$i];
              }
              if ($dot > 0) $bucket |= 1L << $r;
            }
          }
          $out[$b] = $bucket;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RhpBuckets {
  /** DataFrame-API entry point (input cast to array<double>). */
  def rhpBuckets(v: Column, planes: Array[Array[Double]],
      rowsPerBand: Int): Column =
    GraftShims.column(RhpBuckets(
      GraftShims.expression(v.cast("array<double>")), planes, rowsPerBand))
}
