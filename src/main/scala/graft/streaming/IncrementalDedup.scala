package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.llm.Dedup

/** Production shape of STREAMING incremental near-duplicate detection:
  * newly ingested documents arrive as a file stream; each micro-batch
  * probes the persisted MinHash band index, exact-verifies its candidate
  * pairs, APPENDS the discovered pairs to a parquet sink and its own band
  * signatures to the index — all executor-side, nothing accumulates on
  * the driver.
  *
  * Both writes are partitioned by the micro-batch id with dynamic
  * partition overwrite, so a RETRIED batch (foreachBatch is
  * at-least-once) replaces its own partition instead of duplicating it —
  * the sink and the index are idempotent per batch id. Probe-then-append
  * ordering inside a batch plus the self-pair guard in
  * [[Dedup.incrementalMinhashNearDuplicates]] make the cumulative sink
  * exactly-once and micro-batch-split-invariant: a within-batch pair
  * surfaces via new-vs-new, a cross-batch pair surfaces when the later
  * batch probes the index that already holds the earlier one.
  *
  * At 100 TB the per-batch cost is proportional to the batch and its
  * collision set (the index side of the probe is an equality join on
  * (band, bh); bucket the index by those keys to make it shuffle-free),
  * never the corpus.
  */
object IncrementalDedup {

  /** Write `docs`' band signatures into the index under `batch_id=` the
    * given id (use -1L to bootstrap the pre-existing corpus). Dynamic
    * partition overwrite keeps re-runs idempotent. */
  def writeIndex(docs: DataFrame, indexDir: String, batchId: Long,
      idCol: String = "doc_id", textCol: String = "text"): Unit =
    Dedup.minhashBandIndex(docs, idCol, textCol)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(indexDir)

  /** One micro-batch: probe the current index, verify, write pairs and
    * index signatures under this batch id. Exposed so idempotence is
    * directly testable — calling it twice with the same batchId leaves
    * the sink and index byte-identical. */
  def processBatch(spark: SparkSession, corpus: DataFrame, batch: DataFrame,
      batchId: Long, indexDir: String, pairsDir: String, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val idx = spark.read.parquet(indexDir)
      .where(col("batch_id") =!= lit(batchId))
    val pairs = Dedup.incrementalMinhashNearDuplicates(
      batch, corpus, idx, idCol, textCol, threshold)
    pairs.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(pairsDir)
    // append AFTER probing: the index must not contain the batch while
    // the batch probes it, and must contain it before any later batch
    // runs (the batch_id filter above additionally shields a retry whose
    // previous attempt died between the two writes)
    writeIndex(batch, indexDir, batchId, idCol, textCol)
  }

  /** Drain every file currently in `incomingDir` through the incremental
    * pipeline (Trigger.AvailableNow) and return the cumulative pairs read
    * back from the sink. `corpus` must contain every document (old and
    * new) for exact verification; the index at `indexDir` must hold the
    * pre-existing corpus's signatures ([[writeIndex]] with batchId -1). */
  def runAvailableNow(spark: SparkSession, corpus: DataFrame,
      incomingDir: String, schema: StructType, indexDir: String,
      pairsDir: String, threshold: Double, idCol: String = "doc_id",
      textCol: String = "text", maxFilesPerTrigger: Int = 1,
      timeoutMs: Long = 300000): DataFrame = {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(incomingDir)
    val q = stream.writeStream.outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, corpus, batch, batchId, indexDir, pairsDir,
          threshold, idCol, textCol)
      }
      .start()
    require(q.awaitTermination(timeoutMs),
      s"incremental-dedup stream timed out after $timeoutMs ms")
    spark.read.parquet(pairsDir).select(
      col("a_id"), col("b_id"), col("jaccard"))
  }
}
