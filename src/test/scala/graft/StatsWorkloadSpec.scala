package graft

import graft.bench.{BenchHarness, Workload}
import graft.opt.Presets
import graft.plans.QueryPlanOps

/** The Stats-CEB-style workload kit (reference: the Stats workload loader,
  * /root/reference/postbound/workloads.py:1124-1149 — 146 queries over the
  * Stats Stack Exchange dump, the cardinality-estimation benchmark of
  * Han et al. VLDB'21). Stats' defining trait is CORRELATED predicates:
  * several filters per table (bands, IN-lists, LIKE) whose joint
  * selectivity breaks the independence assumption, over an activity
  * schema joined on low-ndv keys. This kit reproduces that trait on the
  * events/documents/embeddings fixtures: multi-filter self-joins on
  * user_id (~67 rows/key — the votes/comments shape), band+band pair
  * queries, and low-ndv equi self-joins (label ndv 10, lang ndv 5) where
  * naive estimates explode. Completes the reference's four-corpus set
  * (JOB / SSB / Stack / Stats) in-repo.
  */
class StatsWorkloadSpec extends SparkSpec {

  test("stats kit: correlated-predicate queries optimize through UES and " +
      "match native") {
    Tables.registerAll(spark, sfDir)
    val wl = Workload.fromDirectory("stats", "/root/repo/workloads/stats")
    assert(wl.size === 146,
      "kit drifted: expected 10 hand-built + 136 statsWalkQuery-generated " +
        "(146 = the reference Stats-CEB workload's query count, " +
        "workloads.py:1124-1149; ≤3 filter-variants per join-graph " +
        "signature, mirroring Stats-CEB's correlated-filter shape)")
    val pipeline = Presets.ues(spark, OptQueries.statsFor(spark, sfDir))
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

  test("UES bounds stay true upper bounds under correlated predicates") {
    Tables.registerAll(spark, sfDir)
    val wl = Workload.fromDirectory("stats", "/root/repo/workloads/stats")
    val pipeline = Presets.ues(spark, OptQueries.statsFor(spark, sfDir))
    // correlation is exactly where unsound shortcuts (selectivity-scaled
    // frequencies) break; the exact filtered-relation probes must keep
    // every bound above its actual here too
    def cards(t: graft.plans.JoinTree[graft.core.Cardinality]): Seq[Double] =
      t match {
        case graft.plans.JoinNode(o, i, a) => cards(o) ++ cards(i) :+ a.value
        case _ => Seq.empty
      }
    var compared = 0
    wl.queries.foreach { case (label, sql) =>
      val res = pipeline.optimizeQuery(sql)
      res.df.collect()
      for {
        est <- res.joinOrder.map(cards)
        act <- QueryPlanOps(res.df).joinTree.map(cards)
        if est.size == act.size
        ((e, a), idx) <- est.zip(act).zipWithIndex
        if !e.isNaN && !a.isNaN && a >= 0
      } {
        compared += 1
        assert(e >= a,
          s"$label join #$idx: UES bound $e below actual $a — not an upper bound")
      }
    }
    assert(compared >= 15, s"only $compared join bounds compared")
  }
}
