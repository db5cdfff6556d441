package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming surface over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props). The reference has no
  * streaming layer (SURVEY §2.10) — this is the planned extension, built on
  * watermarks + windowed/session aggregation + within-watermark dedup so
  * every operator runs incrementally with bounded state at any scale.
  * All transformations are batch/stream agnostic: they take the events
  * DataFrame (streaming or not), so unit tests can assert batch/stream
  * result parity on identical input.
  */
object EventOps {

  /** Streaming source over a parquet events directory. The fixture stores
    * ts as TIMESTAMP(NANOS): declared as long + truncated to micros,
    * exactly like the batch loader (graft.Tables.load).
    */
  def readEventStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // batch probe for the schema: nanos files surface ts as long
    val probe = spark.read.parquet(dir)
    val stream = spark.readStream.schema(probe.schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
    if (probe.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else stream
  }

  /** Tumbling-window counts/sums per event type; late data bounded by the
    * watermark (state is evicted once the watermark passes a window). */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Session aggregation with a 30-minute inactivity gap — the streaming
    * twin of the batch sessionization query (q41): session_window merges
    * events whose gap is under the timeout and closes sessions when the
    * watermark passes. */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("sum_value"))

  /** Exactly-once-per-id dedup with bounded state: duplicates arriving
    * within the watermark horizon are dropped, state beyond it evicted. */
  def dedupeWithinWatermark(events: DataFrame,
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Per-user running counters via typed stateful processing
    * (KeyValueGroupedDataset.mapGroupsWithState is the custom-state escape
    * hatch; here: total events + max value per user). */
  def userTotalsBatch(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(max(col("value")), 2).as("max_value"))
}
