package graft

import graft.bench.{BenchHarness, Workload}
import graft.opt.Presets
import graft.stats.EmulatedStatistics

/** The Stack-style activity workload kit (reference: the Stack workload
  * loader, /root/reference/postbound/workloads.py:1076-1123 — ~6k queries
  * over a StackExchange-like app database, Bao SIGMOD'21). Stack's
  * defining shape is repeated self-joins of ONE large activity table with
  * selective type filters plus time-correlation theta predicates — the
  * shape a training-data pipeline's event-funnel analysis has too. This
  * kit reproduces that shape over the `events` fixture (2-5-way
  * self-joins: funnels, co-occurrence windows, repeat behavior), which
  * exercises the round-3 theta-edge path (equi-connected on user_id,
  * residual time predicates) far harder than the TPC-H-ish kits.
  */
class StackWorkloadSpec extends SparkSpec {

  test("stack kit: self-join funnels optimize through UES and match native") {
    Tables.registerAll(spark, sfDir)
    val wl = Workload.fromDirectory("stack", "/root/repo/workloads/stack")
    assert(wl.size === 6)
    val pipeline = Presets.ues(spark, new EmulatedStatistics(spark))
    val rs = BenchHarness.executeWorkload(spark, wl,
      optimizer = pipeline.optimize _)
    assert(rs.forall(_.status == "ok"), rs.filter(_.status != "ok").toString)
    wl.queries.foreach { case (label, sql) =>
      val res = pipeline.optimizeQuery(sql)
      assert(!res.usedNativeFallback, s"$label fell back to native")
      assert(res.joinOrder.get.tableSet.size >= 2, label)
      assert(sameResults(res.df, spark.sql(sql)), label)
    }
  }
}
