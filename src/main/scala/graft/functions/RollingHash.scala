package graft.functions

import org.apache.spark.sql.{Column, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native polynomial rolling hash over a string's Unicode code points:
  * fold (acc * 31 + codePoint) mod 1e9+7, left to right. Whole-stage
  * codegen fuses the loop; the higher-order-function formulation
  * (aggregate over split(text, '')) allocates an array element per
  * character and interprets a lambda per step. Semantics match engines
  * folding ascii()/codepoint per character (DuckDB list_reduce oracle in
  * t04_fingerprint).
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  private final val Mod = 1000000007L

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val acc = ctx.freshName("acc")
      s"""
        String $s = $c.toString();
        long $acc = 0L;
        int $i = 0;
        while ($i < $s.length()) {
          int $cp = $s.codePointAt($i);
          $acc = ($acc * 31L + $cp) % ${Mod}L;
          $i += java.lang.Character.charCount($cp);
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  def rollingHash(c: Column): Column =
    GraftShims.column(RollingHash(GraftShims.expression(c)))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(Cast(exprs.head, StringType)),
      "built-in")
}
