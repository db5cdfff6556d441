package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed rows for the custom-state sessionizer. Time is carried as epoch
  * MICROseconds end to end — java.sql.Timestamp.getTime would truncate the
  * microsecond precision the event data has, silently shifting session
  * starts by up to a millisecond. */
final case class SessionEvent(user_id: Long, tsUs: Long, value: Double)
final case class OpenSession(startUs: Long, lastUs: Long, n: Long, sum: Double)
final case class UserSession(user_id: Long, session_start: java.sql.Timestamp,
    n_events: Long, sum_value: Double)

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

  /** Streaming source over a parquet events directory, normalizing `ts`
    * to session-zoned TIMESTAMP across fixture vintages exactly like the
    * batch loader (graft.Tables.load): TIMESTAMP(NANOS) is declared as
    * long and truncated to micros; TIMESTAMP(MICROS, isAdjustedToUTC=0)
    * surfaces as TIMESTAMP_NTZ — which `withWatermark` rejects — and is
    * cast (identical instants under the pinned-UTC session).
    */
  def readEventStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // batch probe for the schema: nanos files surface ts as long
    val probe = spark.read.parquet(dir)
    val stream = spark.readStream.schema(probe.schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
    probe.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        stream.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => stream
    }
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

  /** Exactly-once-per-key dedup with bounded state: duplicates arriving
    * within the watermark horizon are dropped, state beyond it evicted.
    * Default key is the unique event id (exactly-once delivery); a coarser
    * key (e.g. user_id+event_type) yields streaming DISTINCT-per-horizon.
    * Batch/stream agnostic like the other EventOps: on a batch frame the
    * horizon trivially covers the whole bounded input, so the exact
    * equivalent is plain dropDuplicates (Spark rejects
    * dropDuplicatesWithinWatermark on batch plans outright).
    */
  def dedupeWithinWatermark(events: DataFrame,
      watermark: String = "1 hour",
      keys: Seq[String] = Seq("event_id")): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
    else events.dropDuplicates(keys)

  /** Stream-static join: enrich a stream with a batch dimension. The
    * static side is planned per micro-batch as an ordinary equi-join. No
    * state, no watermark needed: the join itself is stateless because the
    * static side is fully known at every batch.
    *
    * `broadcastDim` (default true — the common case is a small dimension
    * vs an unbounded stream, and broadcasting means the stream never
    * shuffles for the enrichment) must be set FALSE for a large static
    * side: a forced broadcast of a big dimension OOMs the driver instead
    * of falling back, whereas without the hint the per-batch planner/AQE
    * picks a shuffled join on its own.
    */
  def enrichWithStatic(stream: DataFrame, dim: DataFrame,
      streamKey: String, dimKey: String,
      broadcastDim: Boolean = true): DataFrame =
    stream.join(if (broadcastDim) broadcast(dim) else dim,
      col(streamKey) === col(dimKey))

  /** Per-user running counters via typed stateful processing
    * (KeyValueGroupedDataset.mapGroupsWithState is the custom-state escape
    * hatch; here: total events + max value per user). */
  def userTotalsBatch(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(max(col("value")), 2).as("max_value"))

  /** Watermarked stream-stream interval join: correlate each user's
    * `typeA` events with their `typeB` events within ±`withinMinutes` of
    * event time. The time-bound condition is what makes the state finite:
    * each side buffers only rows younger than watermark + interval, so
    * state size is rate × window regardless of stream length. An inner
    * interval join emits matches as both sides arrive; the watermark only
    * governs state eviction — so on bounded input the streamed result is
    * exactly the batch join.
    */
  def correlateEvents(events: DataFrame, typeA: String, typeB: String,
      withinMinutes: Int = 15, watermark: String = "1 hour"): DataFrame = {
    val a = events.filter(col("event_type") === typeA)
      .select(col("user_id").as("a_user"), col("ts").as("a_ts"),
        col("event_id").as("a_id"))
      .withWatermark("a_ts", watermark)
    val b = events.filter(col("event_type") === typeB)
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"),
        col("event_id").as("b_id"))
      .withWatermark("b_ts", watermark)
    a.join(b, col("a_user") === col("b_user") &&
      col("b_ts") >= col("a_ts") - expr(s"INTERVAL $withinMinutes MINUTES") &&
      col("b_ts") <= col("a_ts") + expr(s"INTERVAL $withinMinutes MINUTES"))
      .select(col("a_user").as("user_id"), col("a_id"), col("b_id"),
        col("a_ts"), col("b_ts"))
  }

  /** Sessionization with CUSTOM state — the flatMapGroupsWithState escape
    * hatch for semantics `session_window` cannot express (per-session
    * derived values, custom merge rules, side outputs). State per user is
    * one open session; a session is emitted when a later event exceeds the
    * inactivity gap, or (streaming) when the event-time timeout fires after
    * the watermark passes `last event + gap`. State is therefore bounded by
    * the number of concurrently active users, and eviction is
    * watermark-driven — the same scale contract as session_window.
    *
    * Batch execution runs the identical code path (all events of a user in
    * one group call, no timeouts), emitting every session closed by a
    * successor event — which a spec exploits for exact parity against the
    * session_window formulation.
    */
  def sessionizeWithState(events: DataFrame, gapMinutes: Int = 30,
      watermark: String = "2 hours"): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    // event-time timeouts need a live watermark; batch plans have none
    val streaming = events.isStreaming
    def tsOf(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp((us / 1000000L) * 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }
    events.select(col("user_id").cast("long").as("user_id"), col("ts"),
        col("value").cast("double").as("value"))
      .withWatermark("ts", watermark)
      // the watermarked ts attribute must remain in the operator's child
      // or event-time timeouts are rejected at analysis; the typed row
      // only deserializes the fields it names
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("tsUs"),
        col("value"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          def closed(s: OpenSession): UserSession =
            UserSession(uid, tsOf(s.startUs), s.n,
              BigDecimal(s.sum).setScale(2, BigDecimal.RoundingMode.HALF_UP)
                .toDouble)
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(closed(s))
          } else {
            // within-batch disorder is sorted away; cross-batch disorder is
            // bounded by the watermark (later rows are dropped upstream)
            val sorted = it.toIndexedSeq.sortBy(_.tsUs)
            val out = Seq.newBuilder[UserSession]
            var open = state.getOption
            sorted.foreach { e =>
              open match {
                case Some(s) if e.tsUs - s.lastUs < gapUs =>
                  open = Some(s.copy(lastUs = math.max(s.lastUs, e.tsUs),
                    n = s.n + 1, sum = s.sum + e.value))
                case Some(s) =>
                  out += closed(s)
                  open = Some(OpenSession(e.tsUs, e.tsUs, 1, e.value))
                case None =>
                  open = Some(OpenSession(e.tsUs, e.tsUs, 1, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              if (streaming) state.setTimeoutTimestamp((s.lastUs + gapUs) / 1000L)
            }
            out.result().iterator
          }
      }
  }
}
