package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** Scratch data probe (not part of the library): measures the fixture's
  * embedding cosine distribution and the SimHash hamming distances of true
  * Jaccard pairs, to pick LSH banding parameters with provable recall. */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = graft.Tables.load(spark, dir, "embeddings")
    val e = emb.select(col("vec_id").cast("bigint").as("id"),
      col("embedding").as("v"))
    val a = e.select(col("id").as("a_id"), col("v").as("va"))
    val b = e.select(col("id").as("b_id"), col("v").as("vb"))
    val cos = a.join(b, col("a_id") < col("b_id"))
      .withColumn("c", graft.functions.CosineSimilarity.cosineSim(col("va"), col("vb")))
    println("== embedding cos distribution ==")
    cos.select(count(lit(1)), max("c"), expr("percentile(c, array(0.5, 0.9, 0.99, 0.999, 0.9999))"))
      .show(false)
    println("signal pairs (c >= 0.40):")
    cos.filter(col("c") >= 0.40).select("a_id", "b_id", "c")
      .orderBy(desc("c")).show(60, false)

    val docs = graft.Tables.load(spark, dir, "documents")
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
    val sigs = Dedup.simHashSignatures(sh).cache()
    val truePairs = Dedup.jaccardPairs(sh, 0.6)
    val withSigs = truePairs
      .join(sigs.select(col("doc_id").as("a_id"), col("simhash").as("ha")), "a_id")
      .join(sigs.select(col("doc_id").as("b_id"), col("simhash").as("hb")), "b_id")
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
    println("== simhash hamming of true jaccard>=0.6 pairs ==")
    withSigs.select(count(lit(1)), min("hamming"), max("hamming"),
      expr("percentile(hamming, array(0.5, 0.9, 1.0))")).show(false)
    withSigs.groupBy("hamming").count().orderBy("hamming").show(70, false)
    spark.stop()
  }
}
