package graft

import graft.bench.{BenchHarness, Workload}
import graft.opt.Presets
import graft.stats.EmulatedStatistics

/** The shipped fixture workload (.sql files under workloads/fixture)
  * through the directory loader and the UES pipeline — the JOB-style
  * workflow of the reference (load workload files -> optimize -> execute ->
  * report) end to end on our schema.
  */
class WorkloadKitSpec extends SparkSpec {

  test("fixture workload loads, optimizes, and executes clean") {
    Tables.registerAll(spark, sfDir)
    val wl = Workload.fromDirectory("fixture", "/root/repo/workloads/fixture")
    assert(wl.size === 5)
    assert(wl.labels === wl.labels.sorted)
    val pipeline = Presets.ues(spark, new EmulatedStatistics(spark))
    val rs = BenchHarness.executeWorkload(spark, wl,
      optimizer = pipeline.optimize _)
    assert(rs.forall(_.status == "ok"), rs.filter(_.status != "ok").toString)
    assert(rs.forall(_.result_rows > 0))
    // and every optimized result equals native execution
    wl.queries.foreach { case (label, sql) =>
      assert(sameResults(pipeline.optimize(sql), spark.sql(sql)), label)
    }
  }
}
