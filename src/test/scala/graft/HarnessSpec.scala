package graft

import graft.bench.{BenchHarness, Workload}
import graft.opt.{UESJoinOrderOptimizer, UESOperatorSelection}
import graft.pipeline.MultiStageOptimizationPipeline
import graft.stats.EmulatedStatistics

class HarnessSpec extends SparkSpec {

  private def wl = Workload.inline("smoke",
    "w1" -> "SELECT count(*) AS n FROM customer",
    "w2" -> """SELECT n_name, count(*) AS n FROM nation, supplier
               WHERE n_nationkey = s_nationkey GROUP BY n_name""",
    "w3" -> "SELECT 1 FROM nonexistent_table")

  test("workload execution reports per-query status contract") {
    Tables.registerAll(spark, sfDir)
    val rs = BenchHarness.executeWorkload(spark, wl)
    assert(rs.size === 3)
    val byLabel = rs.map(r => r.label -> r.status).toMap
    assert(byLabel("w1") === "ok")
    assert(byLabel("w2") === "ok")
    assert(byLabel("w3") === "optimization-error")
    assert(rs.filter(_.status == "ok").forall(_.exec_time >= 0))
  }

  test("progressive output leaves one parseable NDJSON line per completed " +
      "query, including failures") {
    Tables.registerAll(spark, sfDir)
    val p = java.io.File.createTempFile("graft_progress", ".ndjson")
    val rs = BenchHarness.executeWorkload(spark, wl,
      progressTo = Some(p.getAbsolutePath))
    val lines = java.nio.file.Files.readAllLines(p.toPath)
    assert(lines.size === rs.size)
    // each line is valid JSON and in execution order (the crash-recovery
    // contract: a killed run keeps everything completed so far)
    import org.json4s._
    val parsed = lines.toArray.toSeq.map(l =>
      org.json4s.jackson.JsonMethods.parse(l.toString))
    val labels = parsed.map(j => (j \ "label").asInstanceOf[JString].s)
    assert(labels === rs.map(_.label))
    val statuses = parsed.map(j => (j \ "status").asInstanceOf[JString].s)
    assert(statuses.contains("optimization-error"))
    p.delete(): Unit
  }

  test("repetitions and shuffling produce the full cross product") {
    Tables.registerAll(spark, sfDir)
    val ok = wl.filterBy((l, _) => l != "w3")
    val rs = BenchHarness.executeWorkload(spark, ok,
      workloadRepetitions = 2, perQueryRepetitions = 2, shuffled = true)
    assert(rs.size === 8)
    assert(rs.map(_.workload_repetition).toSet === Set(1, 2))
  }

  test("timeout cancels a long-running query") {
    Tables.registerAll(spark, sfDir)
    val heavy = Workload.inline("heavy", "cross3" ->
      """SELECT count(*) AS n FROM lineitem a, lineitem b, lineitem c
         WHERE a.l_orderkey < b.l_orderkey AND b.l_partkey < c.l_partkey""")
    val rs = BenchHarness.executeWorkload(spark, heavy,
      timeoutSec = Some(1.5))
    assert(rs.head.status === "timeout")
  }

  test("parallel executor: bounded pool, correct results, faster than serial") {
    Tables.registerAll(spark, sfDir)
    // each query sleeps ~300 ms executor-side, so serial ~ n*300ms and a
    // k-wide pool ~ ceil(n/k)*300ms — a robust gap even on a noisy box
    spark.udf.register("graft_sleep",
      (ms: Int) => { Thread.sleep(ms.toLong); ms })
    val slow = Workload.inline("slow",
      (1 to 6).map(i => s"s$i" ->
        s"SELECT graft_sleep(300) AS v, count(*) AS n FROM region"): _*)
    val t0 = System.nanoTime()
    val serial = BenchHarness.executeWorkload(spark, slow)
    val serialSec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val par = BenchHarness.executeWorkloadParallel(spark, slow, poolSize = 3)
    val parSec = (System.nanoTime() - t1) / 1e9
    assert(par.size === 6)
    assert(par.map(_.label) === slow.labels) // workload order preserved
    assert(par.forall(_.status == "ok"), par.filter(_.status != "ok").toString)
    assert(par.forall(_.result_rows === 1L))
    assert(parSec < serialSec,
      f"parallel $parSec%.2fs not faster than serial $serialSec%.2fs")
  }

  test("parallel executor isolates failures per query") {
    Tables.registerAll(spark, sfDir)
    val mixed = Workload.inline("mixed",
      "good" -> "SELECT count(*) AS n FROM nation",
      "bad" -> "SELECT 1 FROM no_such_table",
      "alsogood" -> "SELECT count(*) AS n FROM region")
    val rs = BenchHarness.executeWorkloadParallel(spark, mixed, poolSize = 2)
    val byLabel = rs.map(r => r.label -> r.status).toMap
    assert(byLabel("good") === "ok")
    assert(byLabel("bad") === "execution-error")
    assert(byLabel("alsogood") === "ok")
  }

  test("onExecuted hook fires per successful execution with the executed frame") {
    Tables.registerAll(spark, sfDir)
    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val ok = wl.filterBy((l, _) => l != "w3")
    BenchHarness.executeWorkload(spark, ok,
      onExecuted = (sql, df, r) => seen += ((r.label, r.result_rows)))
    assert(seen.map(_._1).toSeq === ok.labels)
    assert(seen.forall(_._2 >= 1))
  }

  test("workload runs through an optimization pipeline") {
    Tables.registerAll(spark, sfDir)
    val pipeline = new MultiStageOptimizationPipeline(spark,
      joinOrder = Some(new UESJoinOrderOptimizer),
      operators = Some(new UESOperatorSelection),
      stats = new EmulatedStatistics(spark))
    val ok = wl.filterBy((l, _) => l == "w2")
    val rs = BenchHarness.executeWorkload(spark, ok,
      optimizer = pipeline.optimize _)
    assert(rs.head.status === "ok")
    assert(rs.head.result_rows > 0)
  }

  test("results separate optimization time from execution time") {
    Tables.registerAll(spark, sfDir)
    val ok = wl.filterBy((l, _) => l != "w3")
    val rs = BenchHarness.executeWorkload(spark, ok)
    assert(rs.forall(_.opt_time_ms >= 0))
    // the exported artifacts carry the column too
    val df = BenchHarness.resultsToDf(spark, rs)
    assert(df.columns.contains("opt_time_ms"))
    assert(BenchHarness.exportJson(ok, rs).contains("\"opt_time_ms\""))
    // a failing optimization still reports how long it took to fail
    val bad = BenchHarness.executeWorkload(spark,
      Workload.inline("bad", "b1" -> "SELECT 1 FROM no_such_table"))
    assert(bad.head.status === "optimization-error")
    assert(bad.head.opt_time_ms >= 0)
  }

  test("a workload run populates the training repository when harvesting " +
      "is on") {
    Tables.registerAll(spark, sfDir)
    val root = java.nio.file.Files
      .createTempDirectory("graft_harvest_spec").toString
    val repo = new graft.train.TrainingDataRepository(spark, root)
    // w2 has a join -> yields samples; w1 is joinless -> contributes none
    val ok = wl.filterBy((l, _) => l != "w3")
    val rs = BenchHarness.executeWorkload(spark, ok, harvest = Some(repo))
    assert(rs.forall(_.status == "ok"))
    val names = Option(new java.io.File(root).listFiles()).toSeq.flatten
      .map(_.getName)
    assert(names.exists(_.contains("w2")), s"repo not populated: $names")
    assert(!names.exists(_.contains("w1")), "joinless query harvested")
    // the harvested samples satisfy the cardinality-feature spec a
    // warm-start consumer would ask for
    val spec = graft.train.TrainingSpec(Seq(
      graft.train.TrainingHarvest.TableSet,
      graft.train.Training.CardinalityF))
    val merged = repo.retrieveMerged(spec)
    assert(merged.isDefined && merged.get.count() > 0)
  }

  test("workload container operations") {
    val w = wl
    assert(w.first(2).labels === Seq("w1", "w2"))
    assert(w.shuffle(1).size === 3)
    assert(w.filterBy((l, _) => l.endsWith("2")).labels === Seq("w2"))
  }

  test("shuffle-byte accounting sees through AQE's hidden subtrees") {
    import org.apache.spark.sql.functions._
    val agg = spark.range(100000L)
      .select((col("id") % 97).as("k"), col("id").as("v"))
      .groupBy("k").agg(sum("v").as("s"))
    // plain plan (AQE off in the test session): bytes flow through the
    // ShuffleExchangeExec branch of the walk
    agg.collect()
    val plain = Bench.shuffleBytes(agg.queryExecution.executedPlan)
    assert(plain > 0, s"plain plan reported $plain shuffle bytes")
    // AQE plan: the exchange hides inside a QueryStageExec under
    // AdaptiveSparkPlanExec — the walk must descend both
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      val agg2 = spark.range(100000L)
        .select((col("id") % 89).as("k"), col("id").as("v"))
        .groupBy("k").agg(sum("v").as("s"))
      agg2.collect()
      val adaptive = Bench.shuffleBytes(agg2.queryExecution.executedPlan)
      assert(adaptive > 0, s"AQE plan reported $adaptive shuffle bytes")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "false")
  }
}
