package graft

import graft.bench.QueryGenerator
import graft.opt.{Presets, UESJoinOrderOptimizer, UESOperatorSelection}
import graft.pipeline.MultiStageOptimizationPipeline
import graft.stats.EmulatedStatistics

/** Fuzz the optimizer: randomly generated SPJ queries must return identical
  * results through the UES pipeline and native Spark — the reference's core
  * invariant, checked over a random workload instead of fixed queries.
  */
class FuzzSpec extends SparkSpec {

  test("20 random queries: optimized results equal native results") {
    Tables.registerAll(spark, sfDir)
    val stats = new EmulatedStatistics(spark)
    val pipeline = new MultiStageOptimizationPipeline(spark,
      joinOrder = Some(new UESJoinOrderOptimizer),
      operators = Some(new UESOperatorSelection),
      stats = stats)
    // GRAFT_FUZZ_N widens the sweep for one-off deep fuzzing runs
    val n = sys.env.get("GRAFT_FUZZ_N").map(_.toInt).getOrElse(20)
    val wl = QueryGenerator.randomWorkload("fuzz", n, seed = 4242L)
    var enforced = 0
    wl.queries.foreach { case (label, sql) =>
      val res = pipeline.optimizeQuery(sql)
      if (!res.usedNativeFallback) enforced += 1
      assert(sameResults(res.df, spark.sql(sql)), s"$label differs: $sql")
    }
    // most generated queries must actually exercise enforcement
    assert(enforced >= (n * 3) / 4, s"only $enforced of $n queries were enforced")
  }

  test("generator is deterministic per seed") {
    assert(QueryGenerator.randomQuery(7L) === QueryGenerator.randomQuery(7L))
    assert(QueryGenerator.randomQuery(7L) !== QueryGenerator.randomQuery(8L))
  }

  test("random queries through the DP preset also match native") {
    Tables.registerAll(spark, sfDir)
    val pipeline = Presets.dynprog(spark)
    QueryGenerator.randomWorkload("fuzzdp", 5, seed = 99L).queries.foreach {
      case (label, sql) =>
        val res = pipeline.optimizeQuery(sql)
        assert(sameResults(res.df, spark.sql(sql)), s"$label differs: $sql")
    }
  }
}
