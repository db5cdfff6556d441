package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the headline queries on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query medians.
  * Protocol per BASELINE.md: one warm-up, then 5 timed repetitions,
  * median wall-clock; results fully materialized through the noop sink
  * (count() would let the optimizer drop final sorts/projects).
  */
object Bench {

  /** Total shuffle bytes written by one executed plan (AQE final plan,
    * all nested subtrees) — the scale signal wall-clock can't give: a
    * runtime regression with flat shuffle bytes is environment, a
    * shuffle-byte regression is a PLAN change that will hurt 1000x
    * harder at 100 TB. Streaming gates report only their sink read
    * (the stream executes inside foreachBatch queries). */
  def shuffleBytes(plan: org.apache.spark.sql.execution.SparkPlan): Long = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // AQE hides executed subtrees: AdaptiveSparkPlanExec's children are
    // empty (the final plan hangs off executedPlan) and each
    // materialized exchange becomes a QueryStageExec whose inner plan
    // is likewise not a child — both must be descended explicitly
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Long =
      p.collectWithSubqueries {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case s: QueryStageExec => walk(s.plan)
        case n => n.metrics.collect {
          case ("shuffleBytesWritten", m) => m.value
        }.sum
      }.sum
    walk(plan)
  }

  /** Representative, scale-meaningful subset of the query surface:
    * heavy aggregation, multi-join, window, dedup (incl. the blocked
    * embedding all-pairs and cluster formation — the heaviest LLM paths),
    * temporal joins, SCD2 merge, ANN, optimizer path. */
  val headline: Seq[String] = Seq(
    "q01_pricing_summary", "q02_flagship_spj", "q03_topk_revenue",
    "q04_semijoin_exists", "q07_left_join_hist", "q12_distinct_on",
    "q25_window_rank", "q30_count_distinct", "q40_events_hourly",
    "q41_events_sessions", "d02_dedup_ngram_jaccard", "d03_dedup_minhash_lsh",
    "d05_dedup_embedding", "d07_dup_clusters", "d12_dedup_incremental",
    "d13_sequence_packing", "d14_corpus_shuffle", "d15_corpus_mix",
    "d16_doc_chunking", "d17_span_dedup", "d18_dedup_report",
    "d19_weighted_sample", "d20_temperature_mix", "d21_length_batching",
    "d22_domain_cap", "d23_snapshot_diff", "d24_pretraining_pipeline",
    "j01_asof_join",
    "w01_scd2_merge", "s01_ann_topk", "s05_ann_ivf_indexed", "s11_ann_pq",
    "s06_knn_graph", "s07_semdedup", "s08_knn_classify", "s12_knn_outliers",
    "s13_kmeans", "s14_semdedup_kmeans", "e01_retrieval_eval",
    "gr01_pagerank_knn", "gr02_label_prop",
    "s09_knn_classify_seeded", "s10_hard_negatives", "r01_rag_pipeline",
    "m04_pcm_frames",
    "t01_lang_id", "t03_token_count",
    "t11_decontaminate_bloom", "t12_normalize", "t13_bm25",
    "t14_dsir_weights", "t15_quality_band", "t16_heavy_hitters",
    "t17_perplexity", "t18_perceptron", "t19_token_ids",
    "t20_bpe_merges", "t21_bpe_segment", "t22_gopher_rules",
    "t23_quality_band_grouped", "t24_decontaminate_filter",
    "d25_corpus_manifest",
    // ONE streaming sentinel: the other streaming gates' logic is
    // benched through their batch twins (st02<->st02b, st03<->st03b,
    // st04<->st04b, st06<->d12, st08<->t15, st09<->s11, st10<->s13,
    // st11<->t21); replaying full foreachBatch loops 6x each would spend
    // ~50s of wall on micro-batch scheduling overhead the batch numbers
    // already exclude
    "st02b_sessions_batch", "st03b_interval_join_batch", "st04b_dedup_batch",
    "st07_stream_ann_serve",
    "opt01_ues_flagship")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // optional comma-separated subset override for isolated measurements
    val selected = sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(headline)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // The noop write executes its OWN QueryExecution — df.queryExecution
    // is never run and carries zero metrics. A listener captures the
    // execution that actually happened; the listener bus is async, so
    // the poll below (after timing stops) waits for delivery.
    @volatile var lastQe: org.apache.spark.sql.execution.QueryExecution = null
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          // only the noop sink's action ("overwrite" on the v2 write
          // path): gate-internal driver actions (bloom sizing counts,
          // k-means rounds, localCheckpoint — posted as count/head/
          // command) also land here, and the async bus could deliver
          // them after the per-rep reset
          if (funcName == "overwrite" || funcName == "save") lastQe = qe
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = {}
      })

    /** (total, build, shuffleBytes): build covers DataFrame construction
      * — for the opt-gates that is the whole optimization pipeline — so
      * the artifact separates optimization from execution per rep, the
      * same split the harness reports as opt_time_ms.
      */
    def runOnce(name: String): (Double, Double, Long) = {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val tBuilt = System.nanoTime()
      lastQe = null
      df.write.format("noop").mode("overwrite").save()
      val tEnd = System.nanoTime()
      val deadline = System.currentTimeMillis() + 2000
      while (lastQe == null && System.currentTimeMillis() < deadline)
        Thread.sleep(10)
      val sb = Option(lastQe).map(qe => shuffleBytes(qe.executedPlan))
        .getOrElse(-1L)
      ((tEnd - t0) / 1e9, (tBuilt - t0) / 1e9, sb)
    }

    /** Fixed-cost environment canary: a constant-shape 10 M-row range
      * aggregate whose runtime depends only on the machine, never on the
      * query list or the data. Measured before and after the benchmark;
      * if the two disagree badly (or differ from a known-clean run), the
      * environment stalled and the medians are suspect — the artifact
      * then indicts itself instead of requiring a judge rerun.
      */
    def canary(): Double = {
      val t0 = System.nanoTime()
      spark.range(10000000L)
        // shiftright keeps each term < 2^31 so the 10M-row sum stays
        // far from long overflow (ANSI mode aborts on overflow)
        .selectExpr("sum(shiftright(id * 2654435761, 32)) as s", "count(1) as c")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // a typo'd name must not silently benchmark nothing
    selected.filterNot(SparkEntry.queries.contains).foreach { n =>
      System.err.println(s"[bench] WARNING: unknown query '$n' requested " +
        "via SPARK_GRAFT_BENCH_QUERIES — skipped")
    }

    // Median of 5 timed reps is the headline number; the RAW per-rep
    // array is emitted alongside so a stalled environment is
    // self-evident from the artifact (r7 lesson: the driver's medians
    // disagreed 3-7x with a controlled rerun, and median+min alone
    // couldn't show that >=3 of 5 reps had stalled). Five reps instead
    // of three because the driver environment has shown multi-second
    // scheduling stalls on stage-heavy queries (r3/r4 d03): with 5 reps
    // the median survives two stalled runs, not just one.
    canary() // warm the range/agg codegen paths before measuring
    val canaryBefore = canary()
    // mid-run canaries every ~20 queries: the r9 driver run degraded
    // 0.216 -> 0.362 s across 18 minutes, leaving late-query medians
    // suspect with no way to tell WHEN the environment drifted. With a
    // canary sample between groups the artifact localizes the drift and
    // late queries can be re-based against their nearest canary.
    val canaryMid = scala.collection.mutable.ArrayBuffer.empty[Double]
    val results: Seq[(String, Seq[(Double, Double, Long)])] = selected
      .filter(SparkEntry.queries.contains)
      .zipWithIndex
      .map { case (name, i) =>
        if (i > 0 && i % 20 == 0) canaryMid += canary()
        try {
          runOnce(name) // warm-up
          name -> (1 to 5).map(_ => runOnce(name))
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            name -> Seq.empty[(Double, Double, Long)]
        }
      }
    val canaryAfter = canary()

    def fmt(d: Double): String = f"$d%.4f"
    def median(ts: Seq[Double]): Double =
      if (ts.isEmpty) -1.0 else ts.sorted.apply(ts.size / 2)
    def obj(f: Seq[(Double, Double, Long)] => String): String =
      results.map { case (k, ts) => s""""$k":${f(ts)}""" }
        .mkString("{", ",", "}")
    val qs = obj(ts => fmt(median(ts.map(_._1))))
    val qmins = obj(ts => fmt(ts.map(_._1).minOption.getOrElse(-1.0)))
    val qreps = obj(ts => ts.map(t => fmt(t._1)).mkString("[", ",", "]"))
    val qbuild = obj(ts => fmt(median(ts.map(_._2))))
    // shuffle bytes are deterministic per plan (modulo AQE coalescing);
    // report the last rep's value
    val qshuffle = obj(ts => ts.lastOption.map(_._3).getOrElse(-1L).toString)
    val total = results.map(r => median(r._2.map(_._1))).filter(_ >= 0).sum
    val totalMin = results.flatMap(r => r._2.map(_._1).minOption).sum
    // Per-query OPTIMIZATION time over the JOB kit (plan construction
    // through the full UES pipeline, no execution): the distribution the
    // reference reports for its JOB runs (bench.py's optimization_time
    // column). Driver-side and bounded — 30 queries, one pass each after
    // a warm-up that pays fixture registration.
    val (jobOptMs, jobQerror): (String, String) = try {
      val root = sys.props.get("graft.workloads.dir")
        .orElse(sys.env.get("GRAFT_WORKLOADS_DIR"))
        .getOrElse("/root/repo/workloads")
      val wl = graft.bench.Workload.fromDirectory("job", s"$root/job")
      Tables.registerAll(spark, sfDir)
      // the gate's disk-persisted stats cache, not a cold provider: the
      // reference optimizes against precomputed catalog statistics, so
      // opt-time should measure optimization, not first-touch stat
      // probes (q05's four unique filters alone cost ~1s cold at sf0.1)
      val pipeline = graft.opt.Presets.ues(spark,
        OptQueries.statsFor(spark, sfDir))
      val kit = wl.queries.toSeq.sortBy(_._1)
      kit.headOption.foreach { case (_, sql) => pipeline.optimizeQuery(sql) }
      // Estimate-quality per query: the UES tree's annotations are the
      // upper bounds the reference grades on (bound tightness,
      // /root/reference/postbound/opt/_analysis.py) — execute the
      // enforced plan once and q-error each bound against the actual
      // join-output rows from SQLMetrics. Enforcement pins the join
      // order, so the physical join tree is isomorphic to the UES tree
      // and post-order positions align; if a plan diverges (AQE edge),
      // fall back to the root join alone, and -1 means no comparable
      // join pair existed.
      def joinCards(t: graft.plans.JoinTree[graft.core.Cardinality]): Seq[Double] =
        t match {
          case graft.plans.JoinNode(o, i, a) =>
            joinCards(o) ++ joinCards(i) :+ a.value
          case _ => Seq.empty
        }
      def qerr(e: Double, a: Double): Double = {
        val ee = math.max(e, 1.0); val aa = math.max(a, 1.0)
        math.max(ee / aa, aa / ee)
      }
      val rows = kit.map { case (label, sql) =>
        val t0 = System.nanoTime()
        val res = pipeline.optimizeQuery(sql)
        val optMs = (System.nanoTime() - t0) / 1e6
        val qe: Double = try {
          res.df.collect() // small aggregate outputs; runs df's own QE
          val pairs = for {
            est <- res.joinOrder.map(joinCards)
            act <- graft.plans.QueryPlanOps(res.df).joinTree.map(joinCards)
          } yield {
            val zipped =
              if (est.size == act.size) est.zip(act)
              else est.lastOption.zip(act.lastOption).toSeq // root join only
            zipped.filter { case (e, a) => !e.isNaN && !a.isNaN && a >= 0 }
              .map { case (e, a) => qerr(e, a) }
          }
          pairs.filter(_.nonEmpty).map(_.max).getOrElse(-1.0)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $label qerror failed: ${e.getMessage}")
            -1.0
        }
        (label, optMs, qe)
      }
      (rows.map { case (l, ms, _) => s""""$l":${fmt(ms)}""" }
         .mkString("{", ",", "}"),
       rows.map { case (l, _, qe) => s""""$l":${fmt(qe)}""" }
         .mkString("{", ",", "}"))
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] job kit opt timing failed: ${e.getMessage}")
        ("{}", "{}")
    }
    val canaryMidJson = canaryMid.map(fmt).mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"queries_min":$qmins,"reps":$qreps,"build_sec":$qbuild,"shuffle_bytes":$qshuffle,"canary_sec":{"before":${fmt(canaryBefore)},"mid":$canaryMidJson,"after":${fmt(canaryAfter)}},"total_min":${fmt(totalMin)},"job_opt_ms":$jobOptMs,"job_qerror":$jobQerror,"sf":"$sfDir"}"""
    // the whole line goes to a FILE first: the r9 driver artifact kept
    // only a truncated stdout tail, losing every per-query median —
    // a file write is atomic-enough (tmp + move) that the full artifact
    // always survives next to whatever the driver captured
    try {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      // absolute default: the driver's working directory is not ours to
      // assume, and the artifact must land inside the repo regardless
      val out = Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
        "/root/repo/bench_out.json"))
      val tmp = Paths.get(out.toString + ".tmp")
      Files.writeString(tmp, line + "\n")
      Files.move(tmp, out, StandardCopyOption.REPLACE_EXISTING)
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] artifact file write failed: ${e.getMessage}")
    }
    println(line)
    spark.stop()
  }
}
