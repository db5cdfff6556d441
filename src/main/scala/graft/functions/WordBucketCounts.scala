package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: per-bucket word counts of a text in one
  * fused byte-level pass — the RAG fixture featurizer
  * (`size(filter(split(text, ' '), w -> ascii(w) % b = i))` per bucket)
  * evaluated 8 interpreted filter+split chains per chunk row. Semantics
  * are exactly the HOF formulation's: words are the maximal runs between
  * single-space separators (empty tokens from repeated spaces never
  * count), a word's bucket is the Unicode code point of its first
  * character modulo `buckets` (matching both `ascii()` and the DuckDB
  * oracle), output is the count vector as array<float>.
  */
case class WordBucketCounts(child: Expression, buckets: Int)
    extends UnaryExpression {
  require(buckets >= 1)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"word_bucket_counts expects string input, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "word_bucket_counts"

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(WordBucketCounts.count(
      v.asInstanceOf[UTF8String], buckets))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      s"""
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          graft.functions.WordBucketCounts.count($x, $buckets));
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordBucketCounts {
  /** Shared by eval and codegen: one pass over the UTF-8 bytes. */
  def count(s: UTF8String, buckets: Int): Array[Float] = {
    val b = s.getBytes
    val n = b.length
    val counts = new Array[Float](buckets)
    var i = 0
    while (i < n) {
      if (b(i) == ' ') i += 1
      else {
        val first = b(i) & 0xff
        // Unicode code point of the word's first character (UTF-8 decode;
        // a malformed sequence falls back to the lead byte)
        val cp =
          if (first < 0x80) first
          else if ((first & 0xe0) == 0xc0 && i + 1 < n)
            ((first & 0x1f) << 6) | (b(i + 1) & 0x3f)
          else if ((first & 0xf0) == 0xe0 && i + 2 < n)
            ((first & 0x0f) << 12) | ((b(i + 1) & 0x3f) << 6) | (b(i + 2) & 0x3f)
          else if ((first & 0xf8) == 0xf0 && i + 3 < n)
            ((first & 0x07) << 18) | ((b(i + 1) & 0x3f) << 12) |
              ((b(i + 2) & 0x3f) << 6) | (b(i + 3) & 0x3f)
          else first
        counts(cp % buckets) += 1f
        while (i < n && b(i) != ' ') i += 1
      }
    }
    counts
  }

  /** DataFrame-API entry point. */
  def wordBucketCounts(text: Column, buckets: Int): Column =
    GraftShims.column(WordBucketCounts(GraftShims.expression(text), buckets))
}
