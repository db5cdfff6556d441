package graft

import graft.bench.{BenchHarness, Workload}
import graft.opt.Presets
import graft.plans.QueryPlanOps

/** The JOB-style many-join workload kit (reference: the Join Order Benchmark
  * loader surface, /root/reference/postbound/workloads.py:936-1038 — JOB is
  * THE workload the UES paper evaluates on). JOB's defining property is not
  * its schema but its shape: 6-13-way joins with aliased repeat relations
  * and selective dimension filters, where join ORDER dominates runtime.
  * This kit reproduces that shape over our fixtures (lineitem self-joins as
  * the repeated fact, doubled nation/region dims), so the join-order
  * machinery (UES/TONIC/DP) is exercised where ordering genuinely matters —
  * the r2 gap was that no in-repo workload went past ~5-way joins.
  */
class JobWorkloadSpec extends SparkSpec {

  test("JOB kit: 6-13-way queries optimize through UES and match native") {
    Tables.registerAll(spark, sfDir)
    val wl = Workload.fromDirectory("job", "/root/repo/workloads/job")
    // 34 hand-built (q01-q34) + 20 generator-emitted single-graph walks
    // (gw01-gw20) + 59 ALIASED walks (gw21-gw79: repeated relations
    // under fresh aliases, 8-13-way, distinct join-graph signature per
    // query, some with cross-alias ORs and events-table hops) —
    // matching the reference's JOB corpus at its full 113-query breadth
    // (/root/reference/postbound/workloads.py:936-980; IMDB itself is
    // not in the sandbox, so breadth parity is structural, not data)
    assert(wl.size === 113)
    val pipeline = Presets.ues(spark, OptQueries.statsFor(spark, sfDir))
    val rs = BenchHarness.executeWorkload(spark, wl,
      optimizer = pipeline.optimize _)
    assert(rs.forall(_.status == "ok"), rs.filter(_.status != "ok").toString)
    wl.queries.foreach { case (label, sql) =>
      val res = pipeline.optimizeQuery(sql)
      assert(!res.usedNativeFallback, s"$label fell back to native")
      // the enforced plan honors a full UES order over all relations
      // (the kit spans 6-13-way shapes)
      assert(res.joinOrder.get.tableSet.size >= 6, label)
      assert(sameResults(res.df, spark.sql(sql)), label)
    }
  }

  test("UES bounds are true upper bounds on every JOB join intermediate") {
    Tables.registerAll(spark, sfDir)
    val wl = Workload.fromDirectory("job", "/root/repo/workloads/job")
    val pipeline = Presets.ues(spark, OptQueries.statsFor(spark, sfDir))
    // the reference's value proposition is BOUND tightness: the UES
    // annotation on each join node is an upper bound on that join's true
    // output, which is what makes the pessimistic order safe (bounded
    // intermediates, never an exploding one). Enforcement pins the join
    // order, so the physical join tree is isomorphic to the UES tree and
    // post-order positions align; compare every aligned pair. All error
    // in job_qerror must therefore be OVERestimation.
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
    // the contract must actually have been exercised, not vacuously true
    assert(compared >= 100, s"only $compared join bounds compared")
  }

  test("branching-mode root bounds stay true upper bounds across the kit") {
    Tables.registerAll(spark, sfDir)
    val wl = Workload.fromDirectory("job", "/root/repo/workloads/job")
    val branching = Presets.ues(spark, OptQueries.statsFor(spark, sfDir),
      subqueryBranching = true)
    // the branch fold now REFINES the step bound via the fragment bound
    // (B*alpha, U*B) — the bench's symmetric q-error cannot distinguish
    // a tighter bound from an UNSOUND one, so the direction is pinned
    // here: the bushy root bound must still dominate the true root
    // cardinality (which is join-order independent)
    def rootCard(t: graft.plans.JoinTree[graft.core.Cardinality]): Double =
      t.annotation.value
    var compared = 0
    wl.queries.foreach { case (label, sql) =>
      val res = branching.optimizeQuery(sql)
      res.df.collect()
      for {
        est <- res.joinOrder.map(rootCard)
        act <- QueryPlanOps(res.df).joinTree.map(rootCard)
        if !est.isNaN && !act.isNaN && act >= 0
      } {
        compared += 1
        assert(est >= act,
          s"$label: branching root bound $est below actual $act")
      }
    }
    assert(compared >= 25, s"only $compared root bounds compared")
  }

  test("UES beats the native join order on C_out for at least one JOB query") {
    Tables.registerAll(spark, sfDir)
    val wl = Workload.fromDirectory("job", "/root/repo/workloads/job")
    val pipeline = Presets.ues(spark, OptQueries.statsFor(spark, sfDir))
    // C_out over ACTUALS: sum of rows produced by every physical join —
    // the cost the UES upper bounds minimize, measured from SQLMetrics
    def actualCout(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect() // collect executes THIS dataset's plan (count() would
      // build and run a separate aggregate plan, leaving these metrics 0)
      QueryPlanOps(df).actualJoinRows.filter(_ >= 0).sum
    }
    val couts = wl.queries.toSeq.map { case (label, sql) =>
      val ues = actualCout(pipeline.optimize(sql))
      val native = actualCout(spark.sql(sql))
      (label, ues, native)
    }
    // UES's pessimistic ordering must win somewhere on this workload...
    assert(couts.exists { case (_, u, n) => u < n },
      couts.map { case (l, u, n) => s"$l: ues=$u native=$n" }.mkString("; "))
    // ...and must never be catastrophically worse anywhere (the UES
    // guarantee is bounded intermediates, not always-optimal plans)
    couts.foreach { case (label, u, n) =>
      assert(u <= n * 10 + 1000, s"$label: ues C_out $u vs native $n")
    }
  }
}
