package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.llm.Similarity

/** STREAMING serving against the persisted product-quantization index
  * (the [[AnnServe]] pattern over the s11 index): query vectors arrive
  * as a file stream, each micro-batch builds its per-query ADC lookup
  * tables, scans the persisted CODES (numSub small ints per corpus
  * vector — the 16x bandwidth lever), exact-cosine re-ranks the top
  * candidates, and writes the per-query top-k under its batch id with
  * dynamic partition overwrite — idempotent per batch, exactly-once
  * cumulatively, nothing on the driver.
  *
  * Batches are independent (the PQ index is static — no append), so
  * micro-batch splitting cannot change any query's answer: the
  * cumulative sink equals the batch probe, which is how the gate
  * shares s11's planted-gap hard oracle verbatim.
  */
object PqServe {

  /** One micro-batch: ADC-probe + re-rank this batch's queries, write
    * their top-k under the batch id. Re-running a batch id leaves the
    * sink byte-identical. */
  def processBatch(batch: DataFrame, batchId: Long, corpus: DataFrame,
      cb: Array[Array[Array[Double]]], codes: DataFrame, sinkDir: String,
      k: Int, nCandidates: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit =
    Similarity.cosineTopKPq(corpus, batch, idCol, vecCol, cb, codes, k,
        nCandidates)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(sinkDir)

  /** Drain every query file in `incomingDir` (Trigger.AvailableNow)
    * through the PQ-ADC pipeline and return the cumulative top-k from
    * the sink. `indexDir` must hold `codebooks/` and `codes/` as
    * written by the s11 staging path; `corpus` is the float side the
    * exact re-rank touches (candidates only). */
  def runAvailableNow(spark: SparkSession, incomingDir: String,
      schema: StructType, indexDir: String, corpus: DataFrame,
      sinkDir: String, k: Int, nCandidates: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxFilesPerTrigger: Int = 1, timeoutMs: Long = 300000): DataFrame = {
    // static side: collected once (kilobytes), reused by every batch
    val cb = Similarity.collectCodebooks(
      spark.read.parquet(s"$indexDir/codebooks"))
    val codes = spark.read.parquet(s"$indexDir/codes")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(incomingDir)
    val q = stream.writeStream.outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, corpus, cb, codes, sinkDir, k,
          nCandidates, idCol, vecCol)
      }
      .start()
    require(q.awaitTermination(timeoutMs),
      s"pq-serve stream timed out after $timeoutMs ms")
    spark.read.parquet(sinkDir)
      .select(col("query_id"), col("rnk"), col("neighbor_id"),
        col("cos_sim"))
  }
}
