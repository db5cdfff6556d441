package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.llm.TextAnalysis

/** Production shape of STREAMING quality routing: newly ingested
  * documents arrive as a file stream, each micro-batch scores them with
  * the composite quality heuristics and ROUTES every document to
  * exactly one of two parquet sinks — keep (score inside the configured
  * band) or reject (outside) — so downstream training-data consumers
  * read a pre-filtered lake and auditors can sample what was dropped.
  *
  * The band bounds are FIXED inputs (computed once from a reference
  * corpus, e.g. [[TextAnalysis.scoreBandFilter]]'s percentiles over
  * yesterday's lake): a stream cannot know global percentiles of data
  * it has not seen, and recomputing them per batch would make routing
  * depend on batch boundaries. With fixed bounds, routing is stateless
  * and per-document, so the cumulative sinks are independent of how
  * the stream splits into micro-batches.
  *
  * Both sinks partition by micro-batch id with dynamic partition
  * overwrite — a retried batch (foreachBatch is at-least-once)
  * replaces its own partitions, keeping keep/reject disjoint and
  * exactly-once cumulatively. Nothing accumulates on the driver; the
  * per-batch cost is one narrow scoring projection plus two filtered
  * writes of that batch.
  */
object QualityRouter {

  /** One micro-batch: score, split on [lo, hi], write both sides under
    * this batch id. Exposed so retry idempotence is directly testable. */
  def processBatch(batch: DataFrame, batchId: Long, lo: Double, hi: Double,
      keepDir: String, rejectDir: String, idCol: String = "doc_id",
      textCol: String = "text"): Unit = {
    val scored = TextAnalysis.qualityScore(batch, idCol, textCol)
      .select(col("doc_id"), col("quality_score"))
      .withColumn("batch_id", lit(batchId))
    val inBand = col("quality_score").between(lo, hi)
    scored.filter(inBand)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(keepDir)
    scored.filter(!inBand)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(rejectDir)
  }

  /** Drain every file currently in `incomingDir` through the router
    * (Trigger.AvailableNow) and return the cumulative KEEP side read
    * back from its sink (the reject side stays queryable at
    * `rejectDir`). */
  def runAvailableNow(spark: SparkSession, incomingDir: String,
      schema: StructType, lo: Double, hi: Double, keepDir: String,
      rejectDir: String, idCol: String = "doc_id",
      textCol: String = "text", maxFilesPerTrigger: Int = 1,
      timeoutMs: Long = 300000): DataFrame = {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(incomingDir)
    val q = stream.writeStream.outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, lo, hi, keepDir, rejectDir, idCol,
          textCol)
      }
      .start()
    require(q.awaitTermination(timeoutMs),
      s"quality-router stream timed out after $timeoutMs ms")
    spark.read.parquet(keepDir).select(col("doc_id"), col("quality_score"))
  }
}
