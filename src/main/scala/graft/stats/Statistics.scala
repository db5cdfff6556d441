package graft.stats

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{GraftShims, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.functions._

/** Most-common-values list: (value, frequency) descending. Port of
  * MostCommonValues (/root/reference/postbound/db/_db.py:1600-1731). */
final case class MostCommonValues(entries: Seq[(Any, Long)]) {
  def maxFrequency: Long = entries.headOption.map(_._2).getOrElse(0L)
  def frequencyOf(v: Any): Option[Long] = entries.find(_._1 == v).map(_._2)
}

/** Equi-width histogram. Port of Histogram
  * (/root/reference/postbound/db/_db.py:1758-1963). */
final case class Histogram(lo: Double, hi: Double, counts: Seq[Long]) {
  def buckets: Int = counts.size
  def total: Long = counts.sum
}

/** Emulated database statistics: every statistic is computed by a Spark
  * aggregation job and memoized, exactly the reference's "emulated
  * statistics" design (/root/reference/postbound/db/_db.py:1981-1999 —
  * there via SQL probes against the live DB, here via DataFrame jobs).
  * Statistics are keyed on the canonicalized plan so semantically equal
  * scans share cache entries. At scale these are one-pass shuffles with
  * map-side partial aggregation; MCV/max-frequency probes are the
  * expensive ones and are the reason the cache exists (same rationale as
  * the reference's disk cache, db/_db.py:322-430).
  */
final class EmulatedStatistics(spark: SparkSession,
    sampleFraction: Option[Double] = None,
    probeClassVersions: Map[String, Int] =
      EmulatedStatistics.probeClassVersions) {
  require(sampleFraction.forall(f => f > 0.0 && f <= 1.0))
  private val cache = TrieMap.empty[(String, String), Any]

  /** When set, every NEW long-valued probe result APPENDS one JSONL line
    * to `<path>.wal` — so a killed/timed-out JVM never loses probe work
    * (a shutdown hook alone does; the driver's per-query timeout kills
    * the JVM hard). The append is O(one entry): the r13 design instead
    * re-serialized the WHOLE cache per new probe, which is O(cache) per
    * probe and O(cache²) per run — measured at 858 s of one spec's first
    * 1211 s of CPU once the shared cache hit 23k entries / 32 MB. Every
    * [[EmulatedStatistics.CompactEvery]] appends the WAL folds into the
    * snapshot file via [[persistTo]] (which first merge-loads both the
    * WAL and the current snapshot, so entries appended OR compacted by
    * a concurrent JVM survive the fold). */
  @volatile private var autoPersistPath: Option[String] = None
  def autoPersistTo(path: String): Unit = {
    autoPersistPath = Some(path)
    // size-based compaction backstop: the per-instance append counter
    // never fires across many short-lived JVMs (each appending under
    // CompactEvery lines), so an inherited oversized WAL is folded
    // here, where every long-lived consumer starts
    try {
      val wp = java.nio.file.Paths.get(walPath(path))
      if (java.nio.file.Files.exists(wp) &&
          java.nio.file.Files.size(wp) > EmulatedStatistics.WalCompactBytes) {
        loadFrom(path)
        persistTo(path)
      }
    } catch { case _: Throwable => }
    EmulatedStatistics.retentionSweep(path)
  }
  private val walAppends = new java.util.concurrent.atomic.AtomicInteger(0)

  private def walPath(path: String): String = path + ".wal"

  private def renderValue(v: Any): Option[String] = v match {
    case l: Long => Some(l.toString)
    case s: Seq[_] if s.forall(_.isInstanceOf[Long]) =>
      Some(s.mkString("[", ",", "]"))
    case _ => None
  }

  /** Run `f` under BOTH the per-instance lock and a cross-process
    * exclusive file lock on `<path>.lock` — a compaction's
    * fold-WAL/write-snapshot/delete-WAL sequence in one JVM must be
    * atomic against appends from another, or a line appended inside
    * the window is deleted before anyone folded it (observed: a
    * 105M-row exact count paid for by a 40 s probe vanished under a
    * concurrent bench's compaction). Probe frequency is low (one lock
    * per genuinely new probe value), so the syscall cost is noise. */
  private def withFileLock[T](path: String)(f: => T): T =
    // JVM-wide monitor per path (not per instance): FileChannel.lock
    // THROWS on a same-JVM overlap, so two instances sharing one cache
    // file (possible in test JVMs) must serialize before the OS lock
    EmulatedStatistics.pathLocks
      .getOrElseUpdate(path, new Object).synchronized {
      val ch = java.nio.channels.FileChannel.open(
        java.nio.file.Paths.get(path + ".lock"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try { val l = ch.lock(); try f finally l.release() }
      finally ch.close()
    }

  private def appendPersist(path: String, plan: String, tag: String,
      v: Any): Unit =
    renderValue(v).foreach { rendered =>
      val line =
        s"""{"plan":${jstr(plan)},"tag":${jstr(tag)},"value":$rendered}""" + "\n"
      // one write() call per line: concurrent JVMs appending to the same
      // WAL interleave at line granularity, and a torn final line from a
      // hard kill is simply skipped on load
      withFileLock(path) {
        java.nio.file.Files.write(java.nio.file.Paths.get(walPath(path)),
          line.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND): Unit
      }
      if (walAppends.incrementAndGet() >= EmulatedStatistics.CompactEvery) {
        // reset the counter only AFTER a successful compaction: a
        // throwing persistTo (swallowed by persistNew) must leave the
        // trigger armed, or a persistently failing compaction lets the
        // WAL grow without bound
        persistTo(path)
        walAppends.set(0)
      }
    }

  private def persistNew(k: (String, String), v: Any): Unit =
    if (persistable(v))
      autoPersistPath.foreach(p =>
        try appendPersist(p, k._1, k._2, v) catch { case _: Throwable => })

  // frequency-type probes run on this fraction and scale back up — the
  // 100 TB mode where a full-scan probe per statistic is unaffordable.
  // Count-scalable probes only: ndv and min/max are NOT linear in the
  // sample and always use the full data (approxDistinctCount is the
  // sketch path for ndv).
  private val f = sampleFraction.getOrElse(1.0)
  private def sTag = sampleFraction.map(x => s"@s$x").getOrElse("")
  private def scaled(n: Long): Long = math.round(n / f)

  // An unlucky empty SAMPLE of a non-empty relation must not collapse a
  // pessimistic bound to 0 (a 0 max frequency makes the UES step bound
  // 0 — the exact unsoundness the bound design forbids): when sampling
  // is enabled and a sampled count/frequency probe comes back zero, the
  // probe re-runs unsampled. A truly empty relation still reports 0,
  // and the fallback fires exactly in the regime where the full probe is
  // affordable (the filtered relation is tiny or empty).
  //
  // This guard repairs ONLY the total-collapse case. Sampling mode as a
  // whole remains APPROXIMATE: a nonempty but unlucky sample can still
  // miss a heavy hitter and underestimate maxFrequency/MCV frequencies,
  // so statistics probed with sampleFraction set are NOT sound upper
  // bounds and must not back a pipeline that claims bound soundness
  // (the UES gates and kits run with sampling off; sampling is the
  // documented 100 TB trade of soundness for probe cost).
  private def unsampledIfZero(sampled: => Long)(full: => Long): Long = {
    val s = sampled
    if (s == 0L && sampleFraction.isDefined) full else s
  }

  private def versioned(tag: String): String = {
    val cls = tag.takeWhile(_ != '[')
    probeClassVersions.get(cls).map(v => s"$tag@v$v").getOrElse(tag)
  }

  /** Whether a (possibly disk-loaded) tag belongs to a STALE probe-class
    * version: its trailing `@vN` differs from the class's current
    * version, or it carries one where the class is now unversioned, or
    * lacks the one now required. A stale entry can never match a
    * current [[key]] — it is dead weight in memory and in every future
    * snapshot — so compaction evicts it ([[persistTo]]); plan-shape
    * orphans (keys whose plan no longer occurs) are NOT detectable here
    * and are bounded instead by the snapshot retention sweep. */
  private def staleVersion(tag: String): Boolean = {
    val m = EmulatedStatistics.VersionSuffix.findFirstMatchIn(tag)
    val base = m.map(x => tag.substring(0, x.start)).getOrElse(tag)
    val cls = base.takeWhile(_ != '[')
    probeClassVersions.get(cls) != m.map(_.group(1).toInt)
  }

  /** Census: entries currently held whose probe-class version is stale
    * (loaded from an older snapshot, will be evicted at the next
    * compaction). */
  def staleVersionCount: Int = cache.keys.count(k => staleVersion(k._2))

  /** Entries evicted by compactions so far (this instance). */
  def evictedStaleCount: Long = evictedStale.get()
  private val evictedStale = new java.util.concurrent.atomic.AtomicLong(0)

  // The string rendering alone is NOT collision-safe: plan.toString
  // truncates past spark.sql.maxPlanStringLength (two large plans
  // sharing a prefix would collide — the bug class the dedup cache
  // hit), and the canonical leaf rendering carries NO relation identity
  // ("Relation [none#0L,none#1] parquet" is the same string for any
  // two-column parquet table). A structural hash must disambiguate —
  // but NOT semanticHash(): LogicalRelation hashes through
  // HadoopFsRelation fields with IDENTITY hashCodes, which are
  // launcher-reproducible but differ between e.g. an sbt-forked and a
  // plain-java JVM, silently splitting the persisted cache per
  // launcher family (measured: the same canonical plan keyed
  // #-1733055680 under sbt and #-1141419458 under java, so a 40 s
  // exact count paid in one family was invisible to the other). The
  // stable digest below replaces every relation leaf with a
  // LocalRelation placeholder before semanticHash (all other nodes
  // hash stably — verified node-by-node) and mixes the relations'
  // root paths back in as strings.
  private def key(plan: LogicalPlan, tag: String): (String, String) = {
    val c = plan.canonicalized
    (s"${c.toString}#${EmulatedStatistics.stableSemanticHash(c)}",
      versioned(tag))
  }

  private def df(plan: LogicalPlan) = GraftShims.ofRows(spark, plan)

  private def sampledDf(plan: LogicalPlan) = {
    val d = df(plan)
    sampleFraction.map(d.sample(_, 42L)).getOrElse(d)
  }

  private def memo[T](plan: LogicalPlan, tag: String)(compute: => T): T = {
    val k = key(plan, tag)
    cache.get(k) match {
      case Some(v) => v.asInstanceOf[T]
      case None =>
        val v = cache.getOrElseUpdate(k, compute)
        // persist eagerly on every genuinely new long-valued (or
        // long-vector) probe; an O(1) WAL append (see appendPersist)
        persistNew(k, v)
        v.asInstanceOf[T]
    }
  }

  def rowCount(plan: LogicalPlan): Long =
    memo(plan, s"count$sTag")(
      unsampledIfZero(scaled(sampledDf(plan).count()))(df(plan).count()))

  /** Cache peek for [[rowCount]]: the memoized (or disk-loaded) value
    * without launching a probe job — lets a probe BUDGET price only
    * genuinely new work (warm probes are free). */
  def rowCountIfCached(plan: LogicalPlan): Option[Long] =
    cache.get(key(plan, s"count$sTag")).collect { case v: Long => v }

  /** Single-row LONG scalar of a probe plan that is already an
    * aggregate (e.g. the UES exact tier's eager-aggregation join
    * count, whose one row is SUM of a count product). Never sampled —
    * callers rely on exactness — memoized and disk-persisted like
    * every probe. A NULL scalar (aggregate over zero input rows) reads
    * as 0, matching COUNT semantics on an empty join.
    *
    * With `timeoutMs` > 0 the probe runs under its own Spark job group
    * and a watchdog cancels it at the deadline, returning None — the
    * gate on an exact probe is the CLOCK, not a row estimate (the row
    * estimate available at the call site is exactly the overestimate
    * the probe exists to correct, so gating on it un-fires the probe
    * precisely where it is most needed). A timeout is cached and
    * persisted as a NEGATIVE sentinel (-timeoutMs), so later calls
    * retry only when offered a strictly larger budget; a success
    * overwrites the sentinel. The enclosing thread's job-group
    * properties are saved and restored, so a caller-scoped group (e.g.
    * a bench execution cap) is untouched. */
  def scalarLong(plan: LogicalPlan, timeoutMs: Long = 0L): Option[Long] = {
    val k = key(plan, "scalar")
    cache.get(k) match {
      case Some(v: Long) if v >= 0L => Some(v)
      case Some(v: Long) if timeoutMs > 0L && -v >= timeoutMs => None
      case _ =>
        def compute(): Long = {
          val r = df(plan).head()
          if (r.isNullAt(0)) 0L else r.getLong(0)
        }
        val result: Option[Long] =
          if (timeoutMs <= 0L) Some(compute())
          else {
            val sc = spark.sparkContext
            val group = s"graft-scalar-probe-${java.util.UUID.randomUUID()}"
            val prev = Seq("spark.jobGroup.id", "spark.job.description",
              "spark.job.interruptOnCancel").map(p => p -> sc.getLocalProperty(p))
            val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
            val task = new java.util.TimerTask {
              def run(): Unit = { fired.set(true); sc.cancelJobGroup(group) }
            }
            sc.setJobGroup(group, "time-capped exact probe",
              interruptOnCancel = true)
            EmulatedStatistics.watchdog.schedule(task, timeoutMs)
            try Some(compute())
            catch {
              // only swallow the cancellation WE caused; clear the
              // interrupt flag the cancellation may have set
              case e: Throwable if fired.get() => Thread.interrupted(); None
            } finally {
              task.cancel()
              prev.foreach { case (p, v) => sc.setLocalProperty(p, v) }
            }
          }
        // store through mergeLong, not a plain put: a concurrent
        // disk merge (persistTo/loadWal) may have landed a success or
        // a LARGER sentinel here, and the in-memory store must obey
        // the same rules (success beats sentinel, larger sentinel
        // beats smaller) or a plain put shrinks the recorded failed
        // budget and re-enables known-futile retries
        result match {
          case Some(v) =>
            mergeLong(k, v)
            persistNew(k, v)
            Some(v)
          case None =>
            val sentinel = -math.max(timeoutMs, 1L)
            mergeLong(k, sentinel)
            persistNew(k, sentinel)
            None
        }
    }
  }

  /** Seed a [[scalarLong]] probe result from an externally MEASURED
    * exact value — e.g. a bench kit execution's SQLMetrics node actual,
    * which is the same physical quantity the eager count plan computes.
    * This is what makes paid exact counts durable across cache
    * re-keying or loss: the kit-actuals file re-derives them for free
    * instead of re-paying a multi-second probe, the reference's
    * true-cardinality feedback
    * (/root/reference/postbound/opt/_cardinalities.py:20).
    *
    * Seeds persist under their OWN probe tag ("scalarseed", never
    * merged into "scalar"): a paid probe and a seeded feedback value
    * are the same quantity but different PROVENANCE, and the bench's
    * seed-free grading pass (`job_qerror_unseeded`) must be able to
    * mask exactly the feedback values while keeping genuinely paid
    * counts live. [[scalarLongIfCached]] reads both;
    * [[scalarLongIfCachedPaid]] reads only paid results. */
  def seedScalarLong(plan: LogicalPlan, v: Long): Unit = {
    require(v >= 0L, s"seeded scalar must be a measured count, got $v")
    def has(k: (String, String)): Boolean = cache.get(k).exists {
      case x: Long => x >= 0L
      case _ => false
    }
    val kSeed = key(plan, "scalarseed")
    if (!has(key(plan, "scalar")) && !has(kSeed)) {
      mergeLong(kSeed, v)
      persistNew(kSeed, v)
    }
  }

  /** Cache peek for [[scalarLong]] — see [[rowCountIfCached]]. Timeout
    * sentinels (negative) read as absent. Reads paid probe results
    * first, then seeded feedback values (see [[seedScalarLong]]). */
  def scalarLongIfCached(plan: LogicalPlan): Option[Long] =
    scalarLongIfCachedPaid(plan).orElse(
      cache.get(key(plan, "scalarseed"))
        .collect { case v: Long if v >= 0L => v })

  /** [[scalarLongIfCached]] restricted to PAID probe results — the
    * read the bench's seed-free exact-tier pass uses, so a
    * true-cardinality feedback value can never masquerade as a count
    * the probe scheduler earned under its own budget. */
  def scalarLongIfCachedPaid(plan: LogicalPlan): Option[Long] =
    cache.get(key(plan, "scalar")).collect { case v: Long if v >= 0L => v }

  /** The persisted timeout sentinel for a [[scalarLong]] probe plan, if
    * any — the largest budget (ms) the probe has already failed under.
    * Callers can skip a launch (and its budget charge) when they cannot
    * offer a strictly larger deadline. */
  def scalarLongSentinelMs(plan: LogicalPlan): Option[Long] =
    cache.get(key(plan, "scalar")).collect { case v: Long if v < 0L => -v }

  /** Filtered row count, keyed on the FILTER PLAN (`Filter(fl, plan)`)
    * rather than a tag embedding the raw expression: plan-level
    * canonicalization normalizes attribute exprIds positionally, while
    * a bare expression's canonicalization cannot (no child output to
    * map positions from) — the old `count[expr#hash]` tags carried
    * fresh exprIds from every parse, so each new JVM re-paid every
    * filtered base-count probe and grew the persisted snapshot without
    * bound (measured: 2,110 cache copies of ONE region-filter probe;
    * +2.4k entries per bench run on a fully warm cache). Same value,
    * same sampling semantics; the computation was always
    * `count(Filter(fl, plan))`, now the key says so too. */
  def rowCount(plan: LogicalPlan, filter: Option[Expression]): Long =
    filter match {
      case Some(fl) => rowCount(Filter(fl, plan))
      case None => rowCount(plan)
    }

  def distinctCount(plan: LogicalPlan, column: String): Long =
    memo(plan, s"ndv[$column]")(
      df(plan).agg(count_distinct(col(column))).head().getLong(0))

  /** HLL-sketched distinct count — the scale path where an exact
    * COUNT(DISTINCT) shuffle is too expensive (reference's emulated stats
    * would issue exact SQL; Spark gives the sketch for free). */
  def approxDistinctCount(plan: LogicalPlan, column: String,
      rsd: Double = 0.05): Long =
    memo(plan, s"andv[$column,$rsd]")(
      df(plan).agg(approx_count_distinct(col(column), rsd)).head().getLong(0))

  /** Highest frequency of any value in the column — the key UES statistic
    * (MaxFrequencyStats, /root/reference/postbound/opt/ues.py:300). */
  def maxFrequency(plan: LogicalPlan, column: String): Long =
    memo(plan, s"maxfreq[$column]$sTag") {
      def probe(d: org.apache.spark.sql.DataFrame, scale: Boolean): Long = {
        // max over zero groups is NULL: an empty (e.g. fully filtered-out)
        // relation has max frequency 0, not a crash
        val r = d.groupBy(col(column)).agg(count(lit(1)).as("c"))
          .agg(max(col("c"))).head()
        if (r.isNullAt(0)) 0L
        else if (scale) scaled(r.getLong(0)) else r.getLong(0)
      }
      unsampledIfZero(probe(sampledDf(plan), scale = true))(
        probe(df(plan), scale = false))
    }

  /** Maximum frequency of a column TUPLE — max number of rows sharing one
    * combination of values across `columns`. The sound cap for a join
    * candidate entering through several simultaneous equi edges (e.g. a
    * lineitem self-join pairing on supplier AND part): the per-edge max
    * frequencies bound each edge independently and miss the conjunction;
    * the tuple frequency bounds the match count of all edges at once.
    * One groupBy shuffle over the tuple key, memoized + persisted. */
  def maxFrequency(plan: LogicalPlan, columns: Seq[String]): Long = {
    require(columns.nonEmpty)
    if (columns.size == 1) return maxFrequency(plan, columns.head)
    memo(plan, s"maxfreq[${columns.sorted.mkString(",")}]$sTag") {
      def probe(d: org.apache.spark.sql.DataFrame, scale: Boolean): Long = {
        val r = d.groupBy(columns.map(col): _*)
          .agg(count(lit(1)).as("c")).agg(max(col("c"))).head()
        if (r.isNullAt(0)) 0L
        else if (scale) scaled(r.getLong(0)) else r.getLong(0)
      }
      unsampledIfZero(probe(sampledDf(plan), scale = true))(
        probe(df(plan), scale = false))
    }
  }

  /** The MCV frequency VECTOR (descending), without the values — all the
    * pessimistic bound needs. Kept separate from [[mostCommonValues]] so
    * the result is a pure Seq[Long] and rides the JSON disk cache
    * (values are Any-typed and do not persist; re-probing MCVs cost the
    * cold JOB kit multi-second optimizations per query). */
  def mcvFrequencies(plan: LogicalPlan, column: String, k: Int = 10): Seq[Long] =
    memo(plan, s"mcvf[$column,$k]$sTag") {
      def probe(d: org.apache.spark.sql.DataFrame, scale: Boolean): Vector[Long] = {
        val rows = d.groupBy(col(column)).agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col(column))
          .limit(k).collect()
        rows.toVector.map(r =>
          if (scale) scaled(r.getLong(1)) else r.getLong(1))
      }
      val s = probe(sampledDf(plan), scale = true)
      // empty-sample guard, same rationale as maxFrequency: an empty MCV
      // vector reads as "relation is empty" downstream (mcvTerm returns
      // a 0 bound term), which only an UNSAMPLED probe may assert
      if (s.isEmpty && sampleFraction.isDefined) probe(df(plan), scale = false)
      else s
    }

  /** Bucketized count/max-degree sketch of a join column — the
    * bound-sketch statistic of Cai, Balazinska & Suciu (SIGMOD'19,
    * "Pessimistic Cardinality Estimation: Tighter Upper Bounds for
    * Intermediate Join Cardinalities"): the column's values hash into
    * [[EmulatedStatistics.BucketCount]] buckets; per bucket the sketch
    * keeps the ROW COUNT and the MAX per-value frequency (degree). A
    * per-bucket join bound Σ_b min(cnt_l[b]·deg_c[b], cnt_c[b]·deg_l[b])
    * then sees skew and disjoint key ranges the single global
    * (count, max-frequency) pair provably cannot — in particular a
    * selective filter on one side zeroes that side's buckets, zeroing
    * the joint term bucket-by-bucket. One aggregation pass per
    * (relation, column), linear in the input like [[maxFrequency]];
    * result is a flat Seq[Long] (counts ++ degrees) riding the JSON
    * disk cache. NULLs are dropped (an inner equi join never matches
    * them). Values are canonicalized to strings before hashing
    * (fractional types through double first), so equal values of the
    * coercible integral/string types used as join keys land in the
    * same bucket on both sides — the caller must not mix fractional
    * and integral members in one bucket comparison (see
    * bucketCompatible in opt.UesBoundModel). Never sampled: a missed
    * heavy value would undercount a degree, the unsound direction. */
  def bucketSketch(plan: LogicalPlan, column: String)
      : (IndexedSeq[Long], IndexedSeq[Long]) = {
    val b = EmulatedStatistics.BucketCount
    val flat = memo(plan, s"bucket[$column,$b]") {
      val d = df(plan)
      val dt = d.schema(d.schema.fieldIndex(column)).dataType
      import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType}
      val canon = dt match {
        case FloatType | DoubleType | _: DecimalType =>
          col(column).cast("double").cast("string")
        case _ => col(column).cast("string")
      }
      val rows = d.select(canon.as("v")).na.drop(Seq("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("f"))
        .groupBy(pmod(xxhash64(col("v")), lit(b)).as("bk"))
        .agg(sum(col("f")).as("cnt"), max(col("f")).as("mx"))
        .collect()
      val cnt = Array.fill(b)(0L)
      val mx = Array.fill(b)(0L)
      rows.foreach { r =>
        val i = r.getLong(0).toInt
        cnt(i) = r.getLong(1); mx(i) = r.getLong(2)
      }
      (cnt ++ mx).toVector
    }
    (flat.take(b), flat.drop(b))
  }

  /** Compressed DEGREE SEQUENCE of a join column — the statistic behind
    * the degree-sequence cardinality bound (Deeds, Suciu, Balazinska &
    * Gatterbauer, "Degree Sequence Bound for Join Cardinality
    * Estimation", ICDT'23): the multiset {count of rows per value},
    * sorted descending, run-length encoded as (degree, number of values
    * at that degree) with degree strictly decreasing. Rank-paired
    * descending sequences upper-bound any value-aligned join sum by the
    * rearrangement inequality — the tightness max-degree × ndv provably
    * lacks. One aggregation pass per (relation, column): the inner
    * group-by is input-linear and the outer one collapses to the number
    * of DISTINCT degrees (tiny). Runs above
    * [[EmulatedStatistics.DegSeqRuns]] merge by rounding the merged
    * run's degree UP to its largest member (pointwise upper envelope —
    * the sound direction). NULLs are dropped (inner equi joins never
    * match them). Never sampled (a missed heavy value would undercount
    * a degree). Persisted flat as deg,count interleaved. */
  def degreeSequence(plan: LogicalPlan, column: String)
      : IndexedSeq[(Long, Long)] = {
    val flat = memo(plan, s"degseq[$column,${EmulatedStatistics.DegSeqRuns}]") {
      val d = df(plan)
      val rows = d.select(col(column).as("v")).na.drop(Seq("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("f"))
        .groupBy(col("f")).agg(count(lit(1)).as("n"))
        .orderBy(col("f").desc)
        .collect()
      val runs = rows.map(r => (r.getLong(0), r.getLong(1))).toVector
      // merge the SMALLEST-degree adjacent runs first: the tail is the
      // flat mass where rounding a degree up costs least
      var rs = runs
      while (rs.size > EmulatedStatistics.DegSeqRuns) {
        val i = rs.size - 2 // merge the last two (smallest degrees)
        rs = rs.take(i) :+ ((rs(i)._1, rs(i)._2 + rs(i + 1)._2))
      }
      rs.flatMap { case (a, b) => Vector(a, b) }
    }
    flat.grouped(2).map(p => (p(0), p(1))).toVector
  }

  /** Bloom-approximated semijoin count — the 100 TB path for the
    * join-sketch reduction probes (opt.UesBoundModel): counts rows of
    * `plan` whose value in each listed column is (probably) present in
    * the partner column's value set, with membership tested through a
    * Bloom filter built from the partner side. One pass over each
    * partner to build the filter (no distinct-set shuffle join) and one
    * pass over `plan` to count. Bloom membership can only produce FALSE
    * POSITIVES, so the count can only OVERcount the exact semijoin —
    * exactly the sound direction for a pessimistic upper bound. The
    * flat membership list is the depth-1 approximation of the exact
    * probe's transitive reduction tree (dropping transitivity also only
    * enlarges). Columns whose types differ are first coerced to their
    * common wider type (membership is string-rendered, and the
    * overcount-only guarantee needs equal values to render equally);
    * column pairs with no common type are rejected. Memoized +
    * disk-persisted like every other probe. */
  private def bloomSemijoinTag(
      memberships: Seq[(String, LogicalPlan, String)], fpp: Double)
      : (Seq[(String, String, LogicalPlan, String)], String) = {
    val normalized = memberships.map { case (c2, p, pc) =>
      (c2, key(p, "")._1, p, pc)
    }.sortBy(t => (t._1, t._2, t._4))
    (normalized, "bloomsemi[" + normalized.map(t =>
      s"${t._1}∈${t._2}|${t._4}").mkString(";") + s",$fpp]")
  }

  /** Cache peek for [[bloomSemijoinCount]] (see [[rowCountIfCached]]). */
  def bloomSemijoinCountIfCached(plan: LogicalPlan,
      memberships: Seq[(String, LogicalPlan, String)],
      fpp: Double = 0.01): Option[Long] = {
    require(memberships.nonEmpty)
    cache.get(key(plan, bloomSemijoinTag(memberships, fpp)._2))
      .collect { case v: Long => v }
  }

  def bloomSemijoinCount(plan: LogicalPlan,
      memberships: Seq[(String, LogicalPlan, String)],
      fpp: Double = 0.01): Long = {
    require(memberships.nonEmpty)
    val (normalized, tag) = bloomSemijoinTag(memberships, fpp)
    memo(plan, tag) {
      val d = df(plan)
      // membership is tested through a string rendering on BOTH sides.
      // Equal values must RENDER equally or membership produces false
      // NEGATIVES (an int 1 vs a decimal 1.00 render '1' vs '1.00') —
      // the unsound direction. When the two columns' types differ (an
      // equi join Spark would coerce), both sides are first cast to the
      // coerced common type, so the rendering agrees exactly where the
      // join's equality would; only then does the overcount-only
      // guarantee hold.
      // explicit broadcasts (destroyed after the count): a multi-MB
      // filter captured in the UDF closure would ride EVERY task
      // binary instead of shipping once per executor
      val bcs = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.spark.broadcast.Broadcast[
          org.apache.spark.util.sketch.BloomFilter]]
      try {
        val filtered = normalized.foldLeft(d) { case (acc, (c2, _, p, pc)) =>
          val lt = acc.schema(acc.schema.fieldIndex(c2)).dataType
          val rt = df(p).schema(df(p).schema.fieldIndex(pc)).dataType
          val common =
            if (lt == rt) lt
            else org.apache.spark.sql.catalyst.analysis.TypeCoercion
              .findWiderTypeForTwo(lt, rt)
              .getOrElse(throw new IllegalArgumentException(
                s"bloomSemijoinCount: no common type for $c2:$lt vs $pc:$rt"))
          val bloom = df(p).select(col(pc).cast(common).cast("string").as("v"))
            .stat.bloomFilter("v", math.max(rowCount(p), 1L), fpp)
          val bc = spark.sparkContext.broadcast(bloom)
          bcs += bc
          val contains = org.apache.spark.sql.functions.udf(
            (s: String) => s != null && bc.value.mightContainString(s))
          acc.filter(contains(col(c2).cast(common).cast("string")))
        }
        filtered.count()
      } finally bcs.foreach(_.destroy())
    }
  }

  /** Count-min-sketched upper bound on a two-relation equi-join size —
    * the cms probe tier's core quantity. The true join size over one
    * equi edge is the frequency inner product Σ_v freq_l(v)·freq_c(v);
    * this computes a sound OVERcount of it with one-pass sketches and
    * no shuffle join:
    *  - one pass over `l` builds a count-min sketch of its key
    *    frequencies plus a Bloom filter of its key set;
    *  - one pass over `c` sums, per row, the CMS point estimate of the
    *    row's key — but only when the Bloom filter says the key is
    *    (probably) present on the l side.
    * Soundness: CMS point estimates NEVER undercount a frequency, and
    * Bloom membership has no false negatives — a key the filter rejects
    * truly has freq_l = 0, so contributing 0 for it is exact, while a
    * false positive merely adds the (nonnegative) CMS estimate. The
    * Bloom pre-filter exists because CMS alone has an additive
    * collision floor ~|l|/width PER LOOKUP: summed over every
    * non-matching c row it would swamp selective joins; with the
    * membership guard the floor is paid only on true matches and the
    * ~0.1 % false positives. Both columns are first coerced to their
    * common wider type and rendered as strings, the same
    * equal-values-render-equally contract as [[bloomSemijoinCount]].
    * Memoized + disk-persisted like every other probe. */
  def cmsJoinCount(lplan: LogicalPlan, lcol: String,
      cplan: LogicalPlan, ccol: String,
      eps: Double = 1e-5, confidence: Double = 0.99): Long = {
    val tag = cmsJoinTag(lplan, lcol, ccol, eps, confidence)
    memo(cplan, tag) {
      val ld = df(lplan)
      val cd = df(cplan)
      val lt = ld.schema(ld.schema.fieldIndex(lcol)).dataType
      val rt = cd.schema(cd.schema.fieldIndex(ccol)).dataType
      val common =
        if (lt == rt) lt
        else org.apache.spark.sql.catalyst.analysis.TypeCoercion
          .findWiderTypeForTwo(lt, rt)
          .getOrElse(throw new IllegalArgumentException(
            s"cmsJoinCount: no common type for $lcol:$lt vs $ccol:$rt"))
      val keys = ld.select(col(lcol).cast(common).cast("string").as("v"))
        .na.drop(Seq("v"))
      val cms = keys.stat.countMinSketch("v", eps, confidence, 42)
      val bloom = keys.stat.bloomFilter("v",
        math.max(rowCount(lplan), 1L), 0.001)
      // explicit broadcasts: a multi-MB sketch captured in the UDF
      // closure would ride EVERY task binary instead of shipping once
      val bcCms = spark.sparkContext.broadcast(cms)
      val bcBloom = spark.sparkContext.broadcast(bloom)
      try {
        val est = org.apache.spark.sql.functions.udf((s: String) =>
          if (s == null || !bcBloom.value.mightContainString(s)) 0L
          else bcCms.value.estimateCount(s))
        val r = cd.select(sum(est(col(ccol).cast(common).cast("string"))))
          .head()
        if (r.isNullAt(0)) 0L else r.getLong(0)
      } finally {
        bcCms.destroy(); bcBloom.destroy()
      }
    }
  }

  private def cmsJoinTag(lplan: LogicalPlan, lcol: String, ccol: String,
      eps: Double, confidence: Double): String =
    s"cmsjoin[${key(lplan, "")._1}|$lcol|$ccol,$eps,$confidence]"

  /** Cache peek for [[cmsJoinCount]] (see [[rowCountIfCached]]). */
  def cmsJoinCountIfCached(lplan: LogicalPlan, lcol: String,
      cplan: LogicalPlan, ccol: String,
      eps: Double = 1e-5, confidence: Double = 0.99): Option[Long] =
    cache.get(key(cplan, cmsJoinTag(lplan, lcol, ccol, eps, confidence)))
      .collect { case v: Long => v }

  /** Approximate maximum frequency, the scale path for the UES statistic:
    * exact maxFrequency is a full groupBy shuffle; this runs freqItems
    * (one pass, bounded sketch) to get heavy-hitter candidates, then counts
    * only those exactly. Falls back to the exact probe when the sketch
    * returns nothing (no item above the support threshold). */
  def approxMaxFrequency(plan: LogicalPlan, column: String,
      support: Double = 0.001): Long =
    memo(plan, s"amaxfreq[$column,$support]") {
      val candidates = df(plan).stat.freqItems(Seq(column), support)
        .head().getSeq[Any](0)
      if (candidates.isEmpty) maxFrequency(plan, column)
      else {
        val r = df(plan).filter(col(column).isin(candidates: _*))
          .groupBy(col(column)).agg(count(lit(1)).as("c"))
          .agg(max(col("c"))).head()
        if (r.isNullAt(0)) maxFrequency(plan, column) else r.getLong(0)
      }
    }

  def minMax(plan: LogicalPlan, column: String): (Double, Double) =
    memo(plan, s"minmax[$column]") {
      val r = df(plan).agg(min(col(column)).cast("double"),
        max(col(column)).cast("double")).head()
      (r.getDouble(0), r.getDouble(1))
    }

  def mostCommonValues(plan: LogicalPlan, column: String, k: Int = 10): MostCommonValues =
    memo(plan, s"mcv[$column,$k]$sTag") {
      val rows = sampledDf(plan).groupBy(col(column)).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col(column))
        .limit(k).collect()
      MostCommonValues(rows.toSeq.map(r => (r.get(0), scaled(r.getLong(1)))))
    }

  def histogram(plan: LogicalPlan, column: String, buckets: Int = 10): Histogram =
    memo(plan, s"hist[$column,$buckets]$sTag") {
      val (lo, hi) = minMax(plan, column) // bounds from FULL data — a
      // sample can miss the extremes and silently clip the histogram
      val width = if (hi > lo) (hi - lo) / buckets else 1.0
      val rows: Array[Row] = sampledDf(plan)
        .select(least(floor((col(column).cast("double") - lit(lo)) / lit(width)),
          lit(buckets - 1)).cast("int").as("b"))
        .groupBy(col("b")).agg(count(lit(1)).as("c"))
        .collect()
      val byBucket = rows.map(r => r.getInt(0) -> scaled(r.getLong(1))).toMap
      Histogram(lo, hi, (0 until buckets).map(b => byBucket.getOrElse(b, 0L)))
    }

  /** The DataFrame of a probe plan — for callers assembling custom
    * probe pipelines (e.g. the optimizer's transitive bloom reduction,
    * whose per-stage Bloom filters live outside the plan algebra). */
  def relation(plan: LogicalPlan): org.apache.spark.sql.DataFrame = df(plan)

  /** Canonical persistable key string of a plan — for callers composing
    * custom probe tags over plan combinations (see [[memoLong]]). */
  def planKey(plan: LogicalPlan): String = key(plan, "")._1

  /** Memoize + disk-persist a caller-computed Long probe under a
    * caller-built tag (which must be deterministic for the probe's
    * semantics, e.g. composed from [[planKey]]s — same contract as the
    * internal probe tags). */
  def memoLong(plan: LogicalPlan, tag: String)(compute: => Long): Long =
    memo(plan, tag)(compute)

  /** Cache peek for [[memoLong]] (see [[rowCountIfCached]]). */
  def memoLongIfCached(plan: LogicalPlan, tag: String): Option[Long] =
    cache.get(key(plan, tag)).collect { case v: Long => v }

  def cacheSize: Int = cache.size

  /** Cache entry counts grouped by probe class (the tag up to its
    * first '[' — count / ndv / maxfreq / mcvf / bloomsemi / …), for the
    * bench artifact's probe-cache breakdown: a growing tier inventory
    * stays attributable to the probe type that grew it. */
  def cacheTagCounts: Map[String, Int] =
    cache.keys.toSeq.map { case (_, tag) =>
      val cut = tag.indexOf('[')
      if (cut < 0) tag else tag.substring(0, cut)
    }.groupBy(identity).map { case (k, v) => k -> v.size }

  // ---- disk persistence for the expensive probes (reference keeps a JSON
  // disk cache keyed by query text, /root/reference/postbound/db/_db.py:
  // 322-430; here: the long-valued stats — counts, ndv, max frequency) ----

  /** Save all long-valued and long-vector (MCV frequency) cache entries
    * to a JSON file. The write is
    * temp-file + atomic rename, so concurrent JVMs sharing the cache file
    * can never observe a torn/partial file (they may race, but each rename
    * leaves a complete, parseable snapshot — and loadFrom merges with
    * putIfAbsent, so a lost update only means re-probing). */
  private def persistable(v: Any): Boolean = v match {
    case _: Long => true
    case s: Seq[_] => s.forall(_.isInstanceOf[Long])
    case _ => false
  }

  def persistTo(path: String): Unit = withFileLock(path) {
    // fold in WAL lines a CONCURRENT JVM may have appended (this JVM's
    // own appends are already in `cache`), so the snapshot about to
    // replace the WAL loses nothing another process paid a probe for;
    // the file lock makes fold→snapshot→delete atomic against appends.
    // ALSO merge-load the current snapshot file: a concurrent JVM may
    // have compacted ITS probes into the snapshot after this JVM
    // loaded it, and a whole-cache rewrite that ignored those entries
    // would silently drop them (last-writer-wins) — merging first
    // makes concurrent compactors converge instead
    try loadWal(path): Unit catch { case _: Throwable => }
    try loadSnapshot(path): Unit catch { case _: Throwable => }
    val sb = new java.lang.StringBuilder(1 << 20)
    sb.append('[')
    var first = true
    cache.toSeq.sortBy(e => (e._1._1, e._1._2)).foreach { case ((p, t), v) =>
      // stale-version eviction: entries whose probe-class version was
      // bumped can never be served again — dropping them here (from
      // the snapshot AND from memory) is what bounds snapshot size
      // across version bumps instead of carrying dead entries forever
      if (staleVersion(t)) {
        cache.remove((p, t))
        evictedStale.incrementAndGet(): Unit
      } else renderValue(v).foreach { rendered =>
        if (!first) sb.append(',')
        first = false
        sb.append("{\"plan\":"); appendJstr(sb, p)
        sb.append(",\"tag\":"); appendJstr(sb, t)
        sb.append(",\"value\":").append(rendered).append('}')
      }
    }
    sb.append(']')
    val target = java.nio.file.Paths.get(path)
    val tmp = java.nio.file.Paths.get(
      s"$path.tmp.${ProcessHandle.current().pid()}.${System.nanoTime()}")
    java.nio.file.Files.writeString(tmp, sb.toString)
    import java.nio.file.StandardCopyOption._
    try java.nio.file.Files.move(tmp, target, REPLACE_EXISTING, ATOMIC_MOVE)
    catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
      java.nio.file.Files.move(tmp, target, REPLACE_EXISTING)
    }
    // the snapshot now holds every WAL entry — retire the WAL (a line
    // appended between the fold above and this delete is lost, which
    // only means re-probing, same as the documented snapshot race)
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(walPath(path))): Unit
  }

  /** Merge a loaded Long under the sentinel rules: a SUCCESS (>= 0)
    * always beats a timeout sentinel, a larger sentinel (more budget
    * already failed) beats a smaller, and nothing clobbers an existing
    * success — so two processes probing independently (one timing out,
    * one succeeding) converge on the success no matter which persists
    * or folds last. */
  private def mergeLong(k: (String, String), v: Long): Unit = {
    var done = false
    while (!done) {
      cache.putIfAbsent(k, v) match {
        case None => done = true
        case Some(old: Long)
            if old < 0L && (v >= 0L || v < old) =>
          done = cache.replace(k, old, v)
        case _ => done = true
      }
    }
  }

  private def loadItem(jv: org.json4s.JValue): Int = {
    import org.json4s._
    jv match {
      case JObject(fields) =>
        val m = fields.toMap
        (m.get("plan"), m.get("tag"), m.get("value")) match {
          case (Some(JString(p)), Some(JString(t)), Some(JInt(v))) =>
            mergeLong((p, t), v.toLong); 1
          case (Some(JString(p)), Some(JString(t)), Some(JArray(vs)))
              if vs.forall(_.isInstanceOf[JInt]) =>
            cache.putIfAbsent((p, t),
              vs.collect { case JInt(v) => v.toLong }.toVector); 1
          case _ => 0
        }
      case _ => 0
    }
  }

  /** Merge-load `<path>.wal` (one JSON object per line; a torn final
    * line from a hard-killed writer parses as garbage and is skipped). */
  private def loadWal(path: String): Int = {
    val wp = java.nio.file.Paths.get(walPath(path))
    if (!java.nio.file.Files.exists(wp)) return 0
    var n = 0
    // decode with REPLACEMENT, not readAllLines: a torn multi-byte
    // write from a hard-killed appender must cost only its own line,
    // not fail the whole WAL load with a MalformedInputException
    new String(java.nio.file.Files.readAllBytes(wp),
      java.nio.charset.StandardCharsets.UTF_8).split('\n').foreach { line =>
      if (line.nonEmpty)
        try n += loadItem(org.json4s.jackson.JsonMethods.parse(line))
        catch { case _: Throwable => }
    }
    n
  }

  /** Merge-load the snapshot file only (same putIfAbsent/mergeLong
    * rules as the WAL load). */
  private def loadSnapshot(path: String): Int = {
    if (!new java.io.File(path).exists()) return 0
    val txt = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    import org.json4s._
    org.json4s.jackson.JsonMethods.parse(txt) match {
      case JArray(items) => items.map(loadItem).sum
      case _ => 0
    }
  }

  /** Pre-load cache entries previously saved with [[persistTo]] /
    * appended by auto-persistence (snapshot file plus its WAL). */
  def loadFrom(path: String): Int = {
    val walN = try loadWal(path) catch { case _: Throwable => 0 }
    loadSnapshot(path) + walN
  }

  // StringBuilder escaper: the per-char flatMap this replaces allocated
  // a String PER CHARACTER and dominated persistence CPU at cache scale
  private def appendJstr(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case _ if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case _ => sb.append(c)
      }
      i += 1
    }
    sb.append('"'): Unit
  }

  private def jstr(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 16)
    appendJstr(sb, s)
    sb.toString
  }
}

object EmulatedStatistics {
  /** Shared daemon watchdog for time-capped probes ([[EmulatedStatistics.scalarLong]]). */
  private[stats] lazy val watchdog =
    new java.util.Timer("graft-probe-watchdog", true)

  /** WAL appends per full-snapshot compaction (see appendPersist): the
    * WAL stays a few MB at most, and a steady-state warm run (tens of
    * new probes) never pays a whole-cache rewrite at all. */
  val CompactEvery: Int = 2000

  /** WAL size (bytes) past which [[EmulatedStatistics.autoPersistTo]]
    * folds it into the snapshot immediately — the backstop for WALs
    * grown by many short-lived JVMs none of which reached
    * [[CompactEvery]] appends on its own counter. */
  val WalCompactBytes: Long = 8L << 20

  private[stats] val VersionSuffix = """@v(\d+)$""".r

  /** Buckets per [[EmulatedStatistics.bucketSketch]]. 64 isolates every
    * key of the low-ndv dimension/label domains (25 nations, 10 labels,
    * 5 langs — where the bucket bound is exact) while keeping a sketch
    * at 128 longs, ~1 KB persisted. */
  val BucketCount: Int = 64

  /** Max run-length pairs per [[EmulatedStatistics.degreeSequence]].
    * TPC-H-shaped columns have ≤ ~50 distinct degrees (the sequence is
    * then EXACT); pathological columns merge tail runs upward. */
  val DegSeqRuns: Int = 64

  /** Snapshot retention: sibling cache files of the same naming scheme
    * untouched for this many days belong to bygone data fingerprints
    * (regenerated fixtures, deleted test dirs) — nothing keyed by the
    * CURRENT fingerprint ever reads them, so they only accumulate
    * (measured: 79 MB of snapshots across 3 fingerprints after two
    * rounds). Swept at [[EmulatedStatistics.autoPersistTo]]. */
  val RetentionDays: Int = 14

  /** Delete same-directory, same-naming-scheme cache files (snapshot +
    * WAL + lock triples) older than [[RetentionDays]]. Only fires when
    * `path` itself follows the fingerprint scheme `<prefix>_<hex>.json`,
    * and never touches the current path's own triple. */
  private[graft] def retentionSweep(path: String): Unit = try {
    val f = new java.io.File(path)
    val dir = Option(f.getParentFile).getOrElse(return)
    val scheme = """^(.*_)[0-9a-f]{8}\.json$""".r
    val prefix = f.getName match {
      case scheme(p) => p
      case _ => return
    }
    val cutoff = System.currentTimeMillis() -
      RetentionDays.toLong * 24 * 3600 * 1000
    val member = (s"^${java.util.regex.Pattern.quote(prefix)}" +
      """[0-9a-f]{8}\.json(\.wal|\.lock)?$""").r
    Option(dir.listFiles()).getOrElse(Array.empty).foreach { g =>
      val stale = member.pattern.matcher(g.getName).matches() &&
        !g.getName.startsWith(f.getName.stripSuffix(".json")) &&
        g.lastModified() < cutoff
      if (stale) g.delete(): Unit
    }
  } catch { case _: Throwable => }

  /** JVM-wide per-path monitors for [[EmulatedStatistics.withFileLock]]. */
  private[stats] val pathLocks =
    scala.collection.concurrent.TrieMap.empty[String, Object]

  /** Launcher-stable structural digest of an already-canonicalized
    * plan. semanticHash() is NOT usable as a persistable key component:
    * several canonical nodes hash through IDENTITY hashCodes that are
    * reproducible within one launcher family but differ across
    * families — LogicalRelation (via HadoopFsRelation's FileIndex /
    * FileFormat) and MultiCommutativeOp (the canonical form of
    * commutative Add/Multiply chains, which stores the operator as a
    * `Class[_]` field), measured as the same canonical plan keying
    * differently under sbt-forked vs plain-java JVMs and silently
    * splitting the persisted cache per launcher. This digest uses NO
    * hashCodes at all: SHA-256 over each node's class name, each
    * expression tree's full string rendering (Expression.toString does
    * not truncate the way plan strings do), and each relation leaf's
    * root paths + schema (the canonical plan string renders every
    * parquet leaf as the identity-free "Relation [...] parquet"). */
  def stableSemanticHash(canonical: LogicalPlan): Long = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
      LogicalRelation}
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def upd(s: String): Unit =
      md.update(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    canonical.foreach { n =>
      upd(n.getClass.getName)
      n match {
        case lr: LogicalRelation =>
          lr.relation match {
            case fs: HadoopFsRelation =>
              fs.location.rootPaths.foreach(p => upd(p.toString))
              upd(fs.schema.catalogString)
            case other =>
              upd(other.getClass.getName); upd(other.schema.catalogString)
          }
        case lo: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
          // a LocalRelation's identity IS its rows (the canonical string
          // renders only the schema, and two same-shaped in-memory
          // fixtures must not share probe entries)
          upd(lo.output.map(_.dataType.catalogString).mkString(","))
          lo.data.foreach(r => upd(r.toString))
        case _ =>
      }
      n.expressions.foreach(e => upd(e.toString))
    }
    java.nio.ByteBuffer.wrap(md.digest).getLong
  }

  /** Per-probe-class schema versions — the persisted cache's selective
    * invalidation path. Plan-SHAPE changes invalidate naturally (the
    * canonicalized key differs, old entries simply orphan); bump a
    * class's version here when the MEANING of its persisted value
    * changes with the plan key unchanged (e.g. a membership-rendering
    * change in `bloomsemi`). The version rides the cache tag
    * (`tag@vN`), so the bump invalidates exactly that class: persisted
    * old-version entries still parse on load, they just never match a
    * current tag — no wholesale cache flush, no stale value served.
    * Class names are the tag prefix up to the first '[' ("count",
    * "ndv", "maxfreq", "mcvf", "bloomsemi", …). All classes are
    * currently at their initial (unversioned) schema. */
  val probeClassVersions: Map[String, Int] = Map.empty
}

/** Prewarming support (reference: PrewarmingSupport, db/_db.py:120-168):
  * pin hot relations in executor memory before measurement. */
object Prewarm {
  def prewarm(dfs: org.apache.spark.sql.DataFrame*): Unit =
    dfs.foreach { df => df.cache(); df.count(): Unit }
  def release(dfs: org.apache.spark.sql.DataFrame*): Unit =
    dfs.foreach(_.unpersist())
}

/** Native-mode statistics: read what Catalyst already derived for the plan
  * (size-based row estimates, or full CBO stats after ANALYZE on catalog
  * tables). Mirrors the reference's native statistics mode
  * (/root/reference/postbound/db/_db.py:1965-1999).
  */
final class NativeStatistics(spark: SparkSession) {
  def rowEstimate(plan: LogicalPlan): Option[BigInt] =
    rowEstimateDetailed(plan).map(_._1)

  /** The estimate plus its provenance: `true` = Catalyst's CBO derived
    * a row count; `false` = the size-based fallback (sizeInBytes over a
    * rough row width — the "estimate" CBO collapses to on shapes it
    * cannot derive, q-errors to 1e56+ on multiplicative fan-outs).
    * Callers reporting estimator quality should split the two: the
    * fallback is CBO giving up, not an estimate. */
  def rowEstimateDetailed(plan: LogicalPlan): Option[(BigInt, Boolean)] = {
    val df = GraftShims.ofRows(spark, plan)
    val stats = df.queryExecution.optimizedPlan.stats
    stats.rowCount.map((_, true)).orElse {
      val width = math.max(plan.output.size * 16, 16)
      Some((stats.sizeInBytes / width, false))
    }
  }
}
