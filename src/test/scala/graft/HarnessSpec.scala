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

  test("workload container operations") {
    val w = wl
    assert(w.first(2).labels === Seq("w1", "w2"))
    assert(w.shuffle(1).size === 3)
    assert(w.filterBy((l, _) => l.endsWith("2")).labels === Seq("w2"))
  }
}
