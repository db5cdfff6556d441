package graft

import graft.bench.Workload
import graft.opt.{UESJoinOrderOptimizer, UESOperatorSelection}
import graft.pipeline.MultiStageOptimizationPipeline

/** The reference's central optimization regression re-expressed at full
  * workload breadth (/root/reference/postbound/tests/
  * test_ues_optimization.py:38-52 runs the ENTIRE JOB workload through
  * the UES pipeline asserting optimized == native): every query of the
  * in-repo JOB and SSB kits goes through one
  * MultiStageOptimizationPipeline, result sets must equal unoptimized
  * Spark, and any query the pre-check rejects is listed EXPLICITLY — a
  * silent fallback shrinking coverage would fail the expected-set
  * assertion, not just dent a percentage.
  */
class WorkloadBreadthSpec extends SparkSpec {

  test("every JOB + SSB query optimizes through one UES pipeline with " +
      "result parity; precheck rejections are pinned") {
    Tables.registerAll(spark, sfDir)
    val job = Workload.fromDirectory("job", "/root/repo/workloads/job")
    val ssb = Workload.fromDirectory("ssb", "/root/repo/workloads/ssb")
    val all = job.queries.toSeq.map { case (l, q) => s"job/$l" -> q } ++
      ssb.queries.toSeq.map { case (l, q) => s"ssb/$l" -> q }
    assert(all.size === 126,
      "kit drifted: expected 113 JOB (34 hand-built + 20 walk-generated " +
        "+ 59 alias-walk-generated) + 13 SSB")

    val pipeline = new MultiStageOptimizationPipeline(spark,
      joinOrder = Some(new UESJoinOrderOptimizer),
      operators = Some(new UESOperatorSelection),
      stats = OptQueries.statsFor(spark, sfDir))

    val fallbacks = scala.collection.mutable.ListBuffer.empty[String]
    all.foreach { case (label, sql) =>
      val res = pipeline.optimizeQuery(sql)
      if (res.usedNativeFallback) fallbacks += label
      assert(sameResults(res.df, spark.sql(sql)),
        s"$label: optimized result differs from native")
    }
    // the explicit rejection list: every kit query currently passes the
    // equi-join pre-check and is fully enforced; a new rejection must be
    // added HERE with a reason, never silently absorbed
    assert(fallbacks.toList === Nil,
      s"precheck-rejected or fallback queries: ${fallbacks.mkString(", ")}")
  }
}
