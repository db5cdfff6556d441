package graft

import graft.bench.{BenchHarness, Workload}
import graft.opt.Presets
import graft.stats.EmulatedStatistics

/** The SSB-style workload kit (13 queries in 4 flights, the reference's SSB
  * loader surface, /root/reference/postbound/workloads.py:1039-1075,
  * re-expressed over our TPC-H-ish star schema with lineitem ⋈ orders as
  * the date source). Every query must run through the UES pipeline and
  * return exactly the native result — the reference's core invariant on a
  * real multi-flight workload, including self-joined dimension aliases
  * (nation/region twice) that exercise aliased-table handling end to end.
  */
class SsbWorkloadSpec extends SparkSpec {

  test("SSB kit: 13 queries load, optimize, and match native execution") {
    Tables.registerAll(spark, sfDir)
    val wl = Workload.fromDirectory("ssb", "/root/repo/workloads/ssb")
    assert(wl.size === 13)
    assert(wl.labels.count(_.startsWith("q3")) === 4)
    val pipeline = Presets.ues(spark, new EmulatedStatistics(spark))
    val rs = BenchHarness.executeWorkload(spark, wl,
      optimizer = pipeline.optimize _)
    assert(rs.forall(_.status == "ok"), rs.filter(_.status != "ok").toString)
    wl.queries.foreach { case (label, sql) =>
      assert(sameResults(pipeline.optimize(sql), spark.sql(sql)), label)
    }
  }
}
