package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation: the composed pipeline the individual operators
  * exist for — language identification, quality scoring, and exact-dup
  * keep-first filtering produce one per-document verdict. Each stage is a
  * narrow transform or a single keyed shuffle; the dedup stage partitions
  * by the md5 digest of the text (16 bytes), never by the text itself, so
  * the shuffle stays small no matter how long documents get.
  *
  * Decisions are made on the ROUNDED quality score (the published value),
  * so the verdict is reproducible across engines — filtering on the
  * unrounded double would let last-ulp noise flip borderline documents.
  */
object Curation {

  /** Per-document curation verdict.
    * Output: (doc_id, pred_lang, quality_score, is_dup_copy, kept). */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      minQuality: Double = 0.8,
      langs: Seq[String] = Seq("en", "es")): DataFrame = {
    val lang = TextAnalysis.languageId(docs, idCol, textCol)
    val quality = TextAnalysis.qualityScore(docs, idCol, textCol)
      .select(col("doc_id"), col("quality_score"))
    val byDigest = Window.partitionBy(md5(col("__text")))
    val dups = docs
      .select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .withColumn("keep_id", min(col("doc_id")).over(byDigest))
      .select(col("doc_id"),
        (col("doc_id") =!= col("keep_id")).as("is_dup_copy"))
    lang.join(quality, "doc_id").join(dups, "doc_id")
      .withColumn("kept",
        col("quality_score") >= minQuality &&
          col("pred_lang").isin(langs: _*) && !col("is_dup_copy"))
      .select(col("doc_id"), col("pred_lang"), col("quality_score"),
        col("is_dup_copy"), col("kept"))
  }
}
