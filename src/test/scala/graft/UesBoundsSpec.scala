package graft

import graft.opt.{JoinGraph, UESJoinOrderOptimizer}
import graft.plans.{JoinNode, JoinTree, ScanNode}
import graft.qal.QueryFacade
import graft.stats.EmulatedStatistics
import graft.core.Cardinality

/** Hand-computed pins for the UES bound math with max-frequency
  * propagation (reference: ues.py:300 MaxFrequencyStats; CIDR'21 bound
  * formulas). The JOB-kit integration test asserts bound >= actual at
  * scale; this spec pins the exact per-step arithmetic — beta/alpha
  * caps, the n:m ndv*mf*mf term, and the row-multiplicity update — on
  * fixtures small enough to verify on paper.
  */
class UesBoundsSpec extends SparkSpec {

  private lazy val stats = new EmulatedStatistics(spark)

  private def bounds(t: JoinTree[Cardinality]): Seq[Double] = t match {
    case JoinNode(o, i, a) => bounds(o) ++ bounds(i) :+ a.value
    case _ => Seq.empty
  }

  test("three-table chain: per-step bounds match the paper formulas and " +
      "the final bound is tight on this fixture") {
    import spark.implicits._
    // ua(a_k): [1,2]            card 2, ndv 2, mf 1
    // ub(b_k,b_j): [(1,10),(1,20),(2,10)]  card 3; b_k ndv 2 mf 2; b_j ndv 2 mf 2
    // uc(c_j): [10,10,20,20,30] card 5, ndv 3, mf 2
    Seq(1, 2).toDF("a_k").createOrReplaceTempView("ua")
    Seq((1, 10), (1, 20), (2, 10)).toDF("b_k", "b_j")
      .createOrReplaceTempView("ub")
    Seq(10, 10, 20, 20, 30).toDF("c_j").createOrReplaceTempView("uc")
    val sql = """SELECT count(*) AS n FROM ua, ub, uc
                 WHERE a_k = b_k AND b_j = c_j"""
    val q = QueryFacade(spark, sql)
    val graph = new JoinGraph(q.joinBlock.get, stats)
    val tree = new UESJoinOrderOptimizer().optimizeJoinOrder(q, graph).get
    // start = ua (min card). Step ub: beta=min(mf(b_k)=2, card 3)=2;
    // alpha=min(mf(a_k)*mu(ua)=1, U=2)=1; bound=min(2*2, 3*1,
    // nm=min(2,2)*1*2=4)=3. mu: ua->2, ub->1.
    // Step uc: beta=min(mf(c_j)=2, 5)=2; alpha=min(mf(b_j)*mu(ub)=2, 3)=2;
    // bound=min(3*2=6, 5*2=10, nm=min(2,3)*2*2=8)=6.
    assert(tree.tables.map(_.identifier) === Seq("ua", "ub", "uc"))
    assert(bounds(tree) === Seq(3.0, 6.0))
    // the actual join result has exactly 6 rows: the bound is tight here
    assert(spark.sql(
      """SELECT count(*) AS n FROM ua JOIN ub ON a_k = b_k
         JOIN uc ON b_j = c_j""").head().getLong(0) === 6L)
  }

  test("pessimistic estimator: subset bounds are true upper bounds and " +
      "the full-set bound matches the optimizer's root annotation") {
    import spark.implicits._
    Seq(1, 2).toDF("a_k").createOrReplaceTempView("pa")
    Seq((1, 10), (1, 20), (2, 10)).toDF("b_k", "b_j")
      .createOrReplaceTempView("pb")
    Seq(10, 10, 20, 20, 30).toDF("c_j").createOrReplaceTempView("pc")
    val sql = """SELECT count(*) AS n FROM pa, pb, pc
                 WHERE a_k = b_k AND b_j = c_j"""
    val q = QueryFacade(spark, sql)
    val graph = new JoinGraph(q.joinBlock.get, stats)
    val est = new graft.opt.PessimisticCardinalityEstimator()
    val precise = new graft.opt.PreciseCardinalities
    // every connected subset: bound >= the true fragment cardinality
    val subsets = Seq(Set("pa"), Set("pb"), Set("pc"), Set("pa", "pb"),
      Set("pb", "pc"), Set("pa", "pb", "pc"))
    subsets.foreach { ts =>
      val b = est.calculateEstimate(graph, ts).value
      val t = precise.calculateEstimate(graph, ts).value
      assert(b >= t, s"$ts: pessimistic $b below true $t")
    }
    // full set agrees with the greedy optimizer's root bound
    val tree = new UESJoinOrderOptimizer().optimizeJoinOrder(q, graph).get
    assert(est.calculateEstimate(graph, Set("pa", "pb", "pc")).value ===
      tree.annotation.value)
    // disconnected pair falls back to the cross-product bound
    assert(est.calculateEstimate(graph, Set("pa", "pc")).value === 10.0)
  }

  test("join-sketch reduction: a filter two hops away tightens the " +
      "candidate cap soundly") {
    import spark.implicits._
    // jr(r_k, r_v): keys 1..5, filter r_v = 1 keeps r_k = 1 only.
    // jd(d_k, d_r): keys 1..10, d_r cycles 1..5 — reduced against
    // filtered jr it keeps d_k in {1, 6}.
    // jf(f_k): keys 1..9 once, key 10 twenty times (card 29, mf 20).
    // Per-relation statistics at the jf step see mf/card/ndv of the RAW
    // jf (the filter is two hops away): bound min(U*20, 29*1, mcv) = 29.
    // The reduction probe counts jf ⋉ (jd ⋉ filtered jr) = 2 rows, so
    // beta caps at 2 and the candidate cap at 2*alpha = 2 — equal to
    // the true result, still an upper bound.
    Seq((1, 1), (2, 2), (3, 3), (4, 4), (5, 5)).toDF("r_k", "r_v")
      .createOrReplaceTempView("jr")
    (1 to 10).map(k => (k, (k - 1) % 5 + 1)).toDF("d_k", "d_r")
      .createOrReplaceTempView("jd")
    ((1 to 9) ++ Seq.fill(20)(10)).toDF("f_k").createOrReplaceTempView("jf")
    val sql = """SELECT count(*) AS n FROM jr, jd, jf
                 WHERE d_r = r_k AND f_k = d_k AND r_v = 1"""
    val q = QueryFacade(spark, sql)
    val graph = new JoinGraph(q.joinBlock.get, stats)
    val without = new UESJoinOrderOptimizer(joinSketch = false)
      .optimizeJoinOrder(q, graph).get
    val withSketch = new UESJoinOrderOptimizer()
      .optimizeJoinOrder(q, graph).get
    val actual = spark.sql(
      """SELECT count(*) AS n FROM jr JOIN jd ON d_r = r_k
         JOIN jf ON f_k = d_k WHERE r_v = 1""").head().getLong(0)
    assert(actual === 2L)
    assert(bounds(without).last === 29.0)
    assert(bounds(withSketch).last === 2.0)
    assert(bounds(withSketch).last >= actual.toDouble)
  }

  test("join-sketch reduction clones a shared neighbor into both " +
      "branches (diamond conjunction)") {
    import spark.implicits._
    // diamond: jc joins jp and jq; BOTH dimensions join the same
    // filtered jx. The reduction of jc must apply the jx restriction
    // through jp's branch AND jq's branch — the second branch needs a
    // cloned jx leaf (fresh expression ids). One-sided reduction would
    // count 5 candidate rows; the conjunction counts 1.
    Seq((1, 1), (2, 2), (3, 3), (4, 4)).toDF("x_k", "x_v")
      .createOrReplaceTempView("jx")
    (1 to 4).map(k => (k, k)).toDF("p_k", "p_x").createOrReplaceTempView("jp")
    (1 to 4).map(k => (k, k)).toDF("q_k", "q_x").createOrReplaceTempView("jq")
    val jcRows = Seq.fill(4)((1, 2)) ++ Seq.fill(4)((2, 1)) ++ Seq((1, 1)) ++
      Seq.fill(8)((3, 3)) ++ Seq.fill(8)((4, 4))
    jcRows.toDF("c_p", "c_q").createOrReplaceTempView("jc")
    val sql = """SELECT count(*) AS n FROM jx, jp, jq, jc
                 WHERE p_x = x_k AND q_x = x_k AND c_p = p_k AND c_q = q_k
                   AND x_v = 1"""
    val q = QueryFacade(spark, sql)
    val graph = new JoinGraph(q.joinBlock.get, stats)
    val without = new UESJoinOrderOptimizer(joinSketch = false)
      .optimizeJoinOrder(q, graph).get
    val withSketch = new UESJoinOrderOptimizer()
      .optimizeJoinOrder(q, graph).get
    val actual = spark.sql(
      """SELECT count(*) AS n FROM jx JOIN jp ON p_x = x_k
         JOIN jq ON q_x = x_k JOIN jc ON c_p = p_k AND c_q = q_k
         WHERE x_v = 1""").head().getLong(0)
    assert(actual === 1L)
    assert(bounds(withSketch).last === 1.0,
      s"conjunction through the cloned branch not applied: ${bounds(withSketch)}")
    assert(bounds(withSketch).last < bounds(without).last)
    assert(bounds(withSketch).last >= actual.toDouble)
  }

  test("joint anchor group: cross-branch value agreement through a " +
      "shared dimension tightens the candidate cap (gw07 in miniature)") {
    import spark.implicits._
    // two dimensions carrying a nation-style attribute, one shared
    // domain table, and a fact joining both dimensions: the fact row
    // survives only when BOTH its dimensions agree on the shared key —
    // per-branch semijoins provably cannot see this (every ga/gb key
    // has witnesses), the joint path join ga ⋈ gd ⋈ gb can.
    Seq((1, 1), (2, 2)).toDF("a_k", "a_d").createOrReplaceTempView("ga")
    Seq((1, 1), (2, 2)).toDF("b_k", "b_d").createOrReplaceTempView("gb")
    Seq(1, 2).toDF("d_k").createOrReplaceTempView("gd")
    // agreeing pair (1,1) once; disagreeing pairs (1,2)/(2,1) heavy
    (Seq((1, 1)) ++ Seq.fill(4)((1, 2)) ++ Seq.fill(4)((2, 1)))
      .toDF("f_a", "f_b").createOrReplaceTempView("gf")
    val sql = """SELECT count(*) AS n FROM ga, gb, gd, gf
                 WHERE a_d = d_k AND b_d = d_k
                   AND f_a = a_k AND f_b = b_k"""
    val q = QueryFacade(spark, sql)
    val graph = new JoinGraph(q.joinBlock.get, stats)
    val without = new UESJoinOrderOptimizer(joinSketch = false)
      .optimizeJoinOrder(q, graph).get
    val withSketch = new UESJoinOrderOptimizer()
      .optimizeJoinOrder(q, graph).get
    val actual = spark.sql(
      """SELECT count(*) AS n FROM ga JOIN gd ON a_d = d_k
         JOIN gb ON b_d = d_k JOIN gf ON f_a = a_k AND f_b = b_k""")
      .head().getLong(0)
    assert(actual === 1L)
    assert(bounds(withSketch).last === 1.0,
      s"agreement not captured: ${bounds(withSketch)}")
    assert(bounds(withSketch).last < bounds(without).last)
  }

  test("matched-intermediate probe: a filtered pk dimension joining " +
      "last collapses the step bound to the matched row count") {
    import spark.implicits._
    // mg (1 row) ⋈ mf (20 rows, hot f_p = 2) ⋈ mp filtered to odd keys:
    // the hot value FAILS the filter, so the MCV rearrangement term
    // (which must pair the hot frequencies pessimistically) stays at
    // 15 while |L ⋉ mp| = 6 — only the matched probe sees which rows
    // actually carry surviving keys. beta = 1 (pk), so the step bound
    // pins to the matched count exactly.
    Seq(1).toDF("g_k").createOrReplaceTempView("mg")
    (Seq.fill(10)((1, 2)) ++
      Seq(1, 3, 4, 5, 6, 7, 8, 9, 10, 11).map(k => (1, k)))
      .toDF("f_g", "f_p").createOrReplaceTempView("mf")
    (1 to 12).map(k => (k, k % 2)).toDF("p_k", "p_v")
      .createOrReplaceTempView("mp")
    val sql = """SELECT count(*) AS n FROM mg, mf, mp
                 WHERE f_g = g_k AND f_p = p_k AND p_v = 1"""
    val q = QueryFacade(spark, sql)
    val graph = new JoinGraph(q.joinBlock.get, stats)
    val withSketch = new UESJoinOrderOptimizer()
      .optimizeJoinOrder(q, graph).get
    val actual = spark.sql(
      """SELECT count(*) AS n FROM mg JOIN mf ON f_g = g_k
         JOIN mp ON f_p = p_k WHERE p_v = 1""").head().getLong(0)
    assert(actual === 6L)
    assert(bounds(withSketch).last === 6.0,
      s"matched probe not applied: ${bounds(withSketch)}")
  }

  test("matched-intermediate probe: a completed cross-table OR prunes " +
      "the step bound (q32 in miniature)") {
    import spark.implicits._
    // the OR spans oa and ob (a theta edge); the fact joins both. At
    // the fact step the matched probe counts the OR-surviving (a, b)
    // pairs — 3 of 4 — and multiplies by the fact's pair frequency.
    Seq((1, 1), (2, 2)).toDF("a_k", "a_v").createOrReplaceTempView("oa")
    Seq((1, 1), (2, 2)).toDF("b_k", "b_v").createOrReplaceTempView("ob")
    (for { a <- Seq(1, 2); b <- Seq(1, 2); _ <- 1 to 5 } yield (a, b))
      .toDF("f_a", "f_b").createOrReplaceTempView("of")
    val sql = """SELECT count(*) AS n FROM oa, ob, of
                 WHERE f_a = a_k AND f_b = b_k
                   AND (a_v = 1 OR b_v = 1)"""
    val q = QueryFacade(spark, sql)
    val graph = new JoinGraph(q.joinBlock.get, stats)
    val without = new UESJoinOrderOptimizer(joinSketch = false)
      .optimizeJoinOrder(q, graph).get
    val withSketch = new UESJoinOrderOptimizer()
      .optimizeJoinOrder(q, graph).get
    val actual = spark.sql(
      """SELECT count(*) AS n FROM oa JOIN ob ON (a_v = 1 OR b_v = 1)
         JOIN of ON f_a = a_k AND f_b = b_k""").head().getLong(0)
    assert(actual === 15L)
    assert(bounds(withSketch).last === 15.0,
      s"cross-table OR not captured: ${bounds(withSketch)}")
    assert(bounds(without).last === 20.0)
  }

  test("exhausted probe budget degrades to the per-relation bound, " +
      "never below the actual") {
    import spark.implicits._
    Seq((1, 1), (2, 2), (3, 3), (4, 4), (5, 5)).toDF("r_k", "r_v")
      .createOrReplaceTempView("zr")
    (1 to 10).map(k => (k, (k - 1) % 5 + 1)).toDF("d_k", "d_r")
      .createOrReplaceTempView("zd")
    ((1 to 9) ++ Seq.fill(20)(10)).toDF("f_k").createOrReplaceTempView("zf")
    val sql = """SELECT count(*) AS n FROM zr, zd, zf
                 WHERE d_r = r_k AND f_k = d_k AND r_v = 1"""
    val q = QueryFacade(spark, sql)
    // fresh statistics: cache hits are free by design (the budget
    // prices only genuinely launched jobs), and this fixture's data is
    // shared with the two-hop test — a warm cache would hand the
    // zero-budget optimizer the probe result for free
    val freshStats = new EmulatedStatistics(spark)
    val graph = new JoinGraph(q.joinBlock.get, freshStats)
    val noBudget = new UESJoinOrderOptimizer(
      budgetFor = () => new graft.opt.ProbeBudget(0, 0L, 0.0))
      .optimizeJoinOrder(q, graph).get
    val full = new UESJoinOrderOptimizer()
      .optimizeJoinOrder(q, graph).get
    // zero budget = no LAUNCHED join probes; per-relation statistics
    // (ndv, max-frequency, degree sequences — one linear pass each,
    // cache-persisted) stay free by design. The degree-sequence rank
    // pairing alone prices the zf step at Σ_i dL[i]·dzf[i] with dL's
    // mass capped at |L| = 2: rank 1 allocates 1 row against zf's
    // deg-20 value, rank 2 against a deg-1 value → 21 (the pre-r15
    // scalar arithmetic gave 29 = 2 + 27 from u·mf slack); with budget
    // the reduction probe caps the candidate at the true 2
    // the deg term carries a 1e-9 relative float guard (padding up, see
    // degEdgeTerms), so the pin reads within that tolerance
    assert(math.abs(bounds(noBudget).last - 21.0) <= 21.0 * 1e-8)
    assert(bounds(full).last === 2.0)
  }

  test("measured node actuals seed the exact-count cache: a zero-budget " +
      "re-optimization reads the fed-back count (gw39 regression class)") {
    import spark.implicits._
    // skewed fact: key 10 carries 20 rows; dim filter keeps keys 1..5
    Seq((1, 1), (2, 2), (3, 3), (4, 4), (5, 5)).toDF("r_k", "r_v")
      .createOrReplaceTempView("sr")
    (1 to 10).map(k => (k, (k - 1) % 5 + 1)).toDF("d_k", "d_r")
      .createOrReplaceTempView("sd")
    ((1 to 9) ++ Seq.fill(20)(10)).toDF("f_k").createOrReplaceTempView("sf")
    val sql = """SELECT count(*) AS n FROM sr, sd, sf
                 WHERE d_r = r_k AND f_k = d_k AND r_v = 1"""
    val q = QueryFacade(spark, sql)
    val freshStats = new EmulatedStatistics(spark)
    val graph = new JoinGraph(q.joinBlock.get, freshStats)
    val zeroBudget = () => new graft.opt.ProbeBudget(0, 0L, 0.0)
    val before = new UESJoinOrderOptimizer(budgetFor = zeroBudget)
      .optimizeJoinOrder(q, graph).get
    assert(bounds(before).last > 2.0) // no probes: per-relation bound only
    // feed back a "measured execution": the true node counts
    val actual = spark.sql(
      """SELECT count(*) AS n FROM sr JOIN sd ON d_r = r_k
         JOIN sf ON f_k = d_k WHERE r_v = 1""").head().getLong(0).toDouble
    val seeded = new UESJoinOrderOptimizer().seedMeasuredActuals(graph,
      Map(Set("sr", "sd") -> 2.0, Set("sr", "sd", "sf") -> actual))
    assert(seeded === 2)
    // a zero-budget optimization now reads the fed-back counts as free
    // cache hits and collapses the root bound to the measured actual
    val after = new UESJoinOrderOptimizer(budgetFor = zeroBudget)
      .optimizeJoinOrder(q, graph).get
    assert(bounds(after).last === actual)
  }

  test("seed provenance: useSeeds=false masks fed-back counts (the " +
      "bench's seed-free grading pass) while PAID probes stay readable") {
    import spark.implicits._
    Seq((1, 1), (2, 2), (3, 3), (4, 4), (5, 5)).toDF("r_k", "r_v")
      .createOrReplaceTempView("ur")
    (1 to 10).map(k => (k, (k - 1) % 5 + 1)).toDF("d_k", "d_r")
      .createOrReplaceTempView("ud")
    ((1 to 9) ++ Seq.fill(20)(10)).toDF("f_k").createOrReplaceTempView("uf")
    val sql = """SELECT count(*) AS n FROM ur, ud, uf
                 WHERE d_r = r_k AND f_k = d_k AND r_v = 1"""
    val q = QueryFacade(spark, sql)
    val freshStats = new EmulatedStatistics(spark)
    val graph = new JoinGraph(q.joinBlock.get, freshStats)
    val zeroBudget = () => new graft.opt.ProbeBudget(0, 0L, 0.0)
    def bound(useSeeds: Boolean, zero: Boolean = true): Double = {
      val opt =
        if (zero) new UESJoinOrderOptimizer(budgetFor = zeroBudget,
          useSeeds = useSeeds)
        else new UESJoinOrderOptimizer(useSeeds = useSeeds)
      bounds(opt.optimizeJoinOrder(q, graph).get).last
    }
    val raw = bound(useSeeds = true) // no probes, nothing cached yet
    val actual = spark.sql(
      """SELECT count(*) AS n FROM ur JOIN ud ON d_r = r_k
         JOIN uf ON f_k = d_k WHERE r_v = 1""").head().getLong(0).toDouble
    assert(raw > actual)
    new UESJoinOrderOptimizer().seedMeasuredActuals(graph,
      Map(Set("ur", "ud") -> 2.0, Set("ur", "ud", "uf") -> actual))
    // default mode reads the seed; the seed-free mode must NOT — it
    // sees exactly the raw bound, so a bound-model regression cannot
    // hide behind the feedback loop (VERDICT r16 #1)
    assert(bound(useSeeds = true) === actual)
    assert(bound(useSeeds = false) === raw)
    // a count the probe scheduler PAYS for under its own budget is
    // legitimate exact-tier coverage — whatever the full-budget
    // seed-free pass earned is visible to a later zero-budget seed-free
    // read (paid entries persist under their own provenance)
    val paid = bound(useSeeds = false, zero = false) // pays + persists
    assert(paid <= raw)
    assert(bound(useSeeds = false) === paid)
  }

  test("bloom tier bounds dominate exact-tier bounds and the actual " +
      "(flat membership, transitivity dropped)") {
    import spark.implicits._
    // direct filtered partner: both tiers probe; bloom's false
    // positives can only overcount. Two-hop filter: bloom's depth-1
    // membership cannot see it (partner unfiltered -> no probe) and
    // falls back to the per-relation cap — above the exact tier's
    // transitive reduction, still sound.
    Seq((1, 1), (2, 1), (3, 0), (4, 0)).toDF("d_k", "d_v")
      .createOrReplaceTempView("wa")
    (Seq.fill(6)(1) ++ Seq.fill(3)(3) ++ Seq(4)).toDF("f_k")
      .createOrReplaceTempView("wf")
    val direct = """SELECT count(*) AS n FROM wa, wf
                    WHERE f_k = d_k AND d_v = 1"""
    val q1 = QueryFacade(spark, direct)
    val g1 = new JoinGraph(q1.joinBlock.get, stats)
    val exact1 = new UESJoinOrderOptimizer()
      .optimizeJoinOrder(q1, new JoinGraph(
        QueryFacade(spark, direct).joinBlock.get, stats)).get
    val bloom1 = new UESJoinOrderOptimizer(sketchTier = "bloom")
      .optimizeJoinOrder(q1, g1).get
    val actual1 = spark.sql(
      """SELECT count(*) AS n FROM wa JOIN wf ON f_k = d_k
         WHERE d_v = 1""").head().getLong(0)
    assert(actual1 === 6L)
    assert(bounds(bloom1).last >= bounds(exact1).last,
      s"bloom ${bounds(bloom1).last} below exact ${bounds(exact1).last}")
    assert(bounds(exact1).last >= actual1.toDouble)
    // two-hop: reuse the budget fixture's shape through the bloom tier
    val twoHop = """SELECT count(*) AS n FROM zr, zd, zf
                    WHERE d_r = r_k AND f_k = d_k AND r_v = 1"""
    Seq((1, 1), (2, 2), (3, 3), (4, 4), (5, 5)).toDF("r_k", "r_v")
      .createOrReplaceTempView("zr")
    (1 to 10).map(k => (k, (k - 1) % 5 + 1)).toDF("d_k", "d_r")
      .createOrReplaceTempView("zd")
    ((1 to 9) ++ Seq.fill(20)(10)).toDF("f_k").createOrReplaceTempView("zf")
    val q2 = QueryFacade(spark, twoHop)
    val g2 = new JoinGraph(q2.joinBlock.get, stats)
    val exact2 = new UESJoinOrderOptimizer().optimizeJoinOrder(q2, g2).get
    val bloom2 = new UESJoinOrderOptimizer(sketchTier = "bloom")
      .optimizeJoinOrder(q2, g2).get
    val actual2 = spark.sql(
      """SELECT count(*) AS n FROM zr JOIN zd ON d_r = r_k
         JOIN zf ON f_k = d_k WHERE r_v = 1""").head().getLong(0)
    assert(bounds(bloom2).last >= bounds(exact2).last)
    assert(bounds(exact2).last >= actual2.toDouble)
    // the cms middle tier slots between them on both fixtures:
    // bloom ≥ cms (cms adds the count-min pairwise term to the same
    // bloom reduction) and cms ≥ exact (the exact pairwise count and
    // the exact tier's full-subset counts are each at most the sketch)
    val cms1 = new UESJoinOrderOptimizer(sketchTier = "cms")
      .optimizeJoinOrder(q1, g1).get
    assert(bounds(bloom1).last >= bounds(cms1).last,
      s"bloom ${bounds(bloom1).last} below cms ${bounds(cms1).last}")
    assert(bounds(cms1).last >= bounds(exact1).last,
      s"cms ${bounds(cms1).last} below exact ${bounds(exact1).last}")
    assert(bounds(cms1).last >= actual1.toDouble)
    val cms2 = new UESJoinOrderOptimizer(sketchTier = "cms")
      .optimizeJoinOrder(q2, g2).get
    assert(bounds(bloom2).last >= bounds(cms2).last)
    assert(bounds(cms2).last >= bounds(exact2).last)
    assert(bounds(cms2).last >= actual2.toDouble)
    // the cmsx DIAGNOSTIC tier (cms term tree + exact pairwise counts,
    // no multi-table probes) slots between cms and exact on both
    // fixtures: exact pair counts are at most the count-min sketches
    // (cms ≥ cmsx) and the exact tier only adds further sound terms
    // (cmsx ≥ exact); its bound stays above the actual like every tier
    val cmsx1 = new UESJoinOrderOptimizer(sketchTier = "cmsx")
      .optimizeJoinOrder(q1, g1).get
    assert(bounds(cms1).last >= bounds(cmsx1).last,
      s"cms ${bounds(cms1).last} below cmsx ${bounds(cmsx1).last}")
    assert(bounds(cmsx1).last >= bounds(exact1).last,
      s"cmsx ${bounds(cmsx1).last} below exact ${bounds(exact1).last}")
    assert(bounds(cmsx1).last >= actual1.toDouble)
    val cmsx2 = new UESJoinOrderOptimizer(sketchTier = "cmsx")
      .optimizeJoinOrder(q2, g2).get
    assert(bounds(cms2).last >= bounds(cmsx2).last)
    assert(bounds(cmsx2).last >= bounds(exact2).last)
    assert(bounds(cmsx2).last >= actual2.toDouble)
  }

  test("cms tier union-bound pair term: a cross-table OR tightens the " +
      "pair sketch soundly (gw26/gw49 class in miniature)") {
    import spark.implicits._
    // vf(f_k, f_v): 20 rows over keys 1..4, f_v = 1 on keys 1..2 rows
    // vd(d_k, d_v): keys 1..4, d_v = 1 on key 1 only
    // join on f_k = d_k with (f_v = 1 OR d_v = 1): qualifying pairs are
    // f-rows with v=1 (keys 1,2: 10 rows) plus key-1 rows via d_v
    // (5 rows, 5 already counted) = 12 rows; without the OR: 20.
    (1 to 20).map(i => (i % 4 + 1, if (i % 4 + 1 <= 2) 1 else 0))
      .toDF("f_k", "f_v").createOrReplaceTempView("vf")
    Seq((1, 1), (2, 0), (3, 0), (4, 0)).toDF("d_k", "d_v")
      .createOrReplaceTempView("vd")
    val sql = """SELECT count(*) AS n FROM vf, vd
                 WHERE f_k = d_k AND (f_v = 1 OR d_v = 1)"""
    val q = QueryFacade(spark, sql)
    val freshStats = new EmulatedStatistics(spark)
    val graph = new JoinGraph(q.joinBlock.get, freshStats)
    val actual = spark.sql(
      """SELECT count(*) AS n FROM vf JOIN vd ON f_k = d_k
         WHERE f_v = 1 OR d_v = 1""").head().getLong(0)
    val cms = new UESJoinOrderOptimizer(sketchTier = "cms")
      .optimizeJoinOrder(q, graph).get
    // union bound: |pairs with f_v=1| + |pairs with d_v=1| = 10 + 5 = 15
    // (vs 20 for the OR-blind equi sketch); sound: >= the true 12
    assert(bounds(cms).last >= actual.toDouble)
    assert(bounds(cms).last <= 15.0,
      s"OR union-bound pair term not applied: ${bounds(cms)}")
    // the exact tier's pair count applies the OR exactly and the tier
    // ordering holds through the new term
    val exact = new UESJoinOrderOptimizer()
      .optimizeJoinOrder(q, graph).get
    assert(bounds(cms).last >= bounds(exact).last)
    assert(bounds(exact).last >= actual.toDouble)
  }

  test("exact tier: an expanding skewed step counts the true " +
      "intermediate (q17-class max-vs-average residual collapses)") {
    import spark.implicits._
    // xf: key 1 ×10, keys 2..5 ×1 (card 14, mf 10); xg: key 1 ×1,
    // keys 2..5 ×10 (card 41, mf 10). Every per-relation term prices
    // the step with MAX frequencies — and the rearrangement term must
    // pair the two hot keys (10·10) even though the hot values miss
    // each other in the data: provisional ≥ 100 vs actual 50. The step
    // expands the running bound ≥ ExactStepMultiplier (u = 14), so the
    // exact tier counts the true intermediate outright and the bound
    // lands exactly on the actual — the residual no frequency cap can
    // see, because it is a property of the joint distribution.
    (Seq.fill(10)(1) ++ Seq(2, 3, 4, 5)).toDF("f_k")
      .createOrReplaceTempView("xf")
    (Seq(1) ++ Seq(2, 3, 4, 5).flatMap(k => Seq.fill(10)(k))).toDF("g_k")
      .createOrReplaceTempView("xg")
    val sql = """SELECT count(*) AS n FROM xf, xg WHERE f_k = g_k"""
    val q = QueryFacade(spark, sql)
    val graph = new JoinGraph(q.joinBlock.get, stats)
    val without = new UESJoinOrderOptimizer(joinSketch = false)
      .optimizeJoinOrder(q, graph).get
    val withSketch = new UESJoinOrderOptimizer()
      .optimizeJoinOrder(q, graph).get
    val actual = spark.sql(
      "SELECT count(*) AS n FROM xf JOIN xg ON f_k = g_k")
      .head().getLong(0)
    assert(actual === 50L)
    assert(bounds(withSketch).last === 50.0,
      s"exact tier not applied: ${bounds(withSketch)}")
    assert(bounds(without).last > 50.0,
      s"fixture lost its slack: ${bounds(without)}")
  }

  test("exact tier: eager-aggregation count is exact on a filtered " +
      "triple self-join (sum of frequency products, not a fan-out join)") {
    import spark.implicits._
    // xh: key 1 carries values 0..4 (freq 5), keys 2,3 singletons. The
    // filter on alias ha keeps h_v <= 2 (key-1 freq drops to 3), so the
    // exact count is sum_k f_ha(k)*f_hb(k)*f_hc(k) = 3*5*5 + 1 + 1 = 77
    // — the eager plan computes exactly that sum from three per-alias
    // aggregates (input-bounded), never building the 77-row join. Both
    // expanding steps clear ExactStepMultiplier, so the root bound
    // lands on the actual; per-relation terms alone stay above it
    // (max-frequency slack: the without-sketch bound prices key 1 at
    // its max freq through both expansions).
    ((1 to 5).map(v => (1, v - 1)) ++ Seq((2, 0), (3, 0))).toDF("h_k", "h_v")
      .createOrReplaceTempView("xh")
    val sql = """SELECT count(*) AS n FROM xh ha, xh hb, xh hc
                 WHERE ha.h_k = hb.h_k AND hb.h_k = hc.h_k AND ha.h_v <= 2"""
    val q = QueryFacade(spark, sql)
    val graph = new JoinGraph(q.joinBlock.get, stats)
    val withSketch = new UESJoinOrderOptimizer()
      .optimizeJoinOrder(q, graph).get
    val without = new UESJoinOrderOptimizer(joinSketch = false)
      .optimizeJoinOrder(q, graph).get
    val actual = spark.sql(sql).head().getLong(0)
    assert(actual === 77L)
    assert(bounds(withSketch).last === 77.0,
      s"exact tier not applied: ${bounds(withSketch)}")
    assert(bounds(without).last > 77.0,
      s"fixture lost its slack: ${bounds(without)}")
  }

  test("derived theta edges: the equivalence class rewrites a theta " +
      "conjunct onto the pair execution applies it at (q17 in miniature)") {
    import spark.implicits._
    // a_k < b_k with c_a = a_k: Spark's optimizer infers c_a < b_k and
    // applies it wherever vc meets vb first — probe plans and step
    // triggers must see the same implied edge or they price a
    // different query than the one that executes.
    Seq(1, 2, 3).toDF("a_k").createOrReplaceTempView("va")
    Seq((2, 1), (3, 2), (1, 3)).toDF("b_k", "b_j")
      .createOrReplaceTempView("vb")
    Seq((1, 1), (2, 2), (3, 3)).toDF("c_k", "c_a")
      .createOrReplaceTempView("vc")
    // equi edges vc-va (c_a = a_k) and vc-vb (c_k = b_j) keep the graph
    // equi-connected (the UES precondition); the theta conjunct sits on
    // va-vb, and the a_k ~ c_a equivalence class rewrites it onto vc-vb
    // — where execution can apply it one join earlier.
    val sql = """SELECT count(*) AS n FROM va, vb, vc
                 WHERE c_a = a_k AND c_k = b_j AND a_k < b_k"""
    val q = QueryFacade(spark, sql)
    val graph = new JoinGraph(q.joinBlock.get, stats)
    val derived = graph.derivedThetaEdges
    assert(derived.exists(e => e.tables == Set("vc", "vb") &&
      e.equiColumns.isEmpty),
      s"missing derived vc<vb edge: ${derived.map(_.tables)}")
    // derivation adds, never replaces: the block's own edges unchanged
    assert(graph.edges.map(_.tables).toSet ===
      Set(Set("va", "vc"), Set("va", "vb"), Set("vc", "vb")))
    // and the bound over the executed plan stays a true upper bound
    val tree = new UESJoinOrderOptimizer().optimizeJoinOrder(q, graph).get
    val actual = spark.sql(
      """SELECT count(*) AS n FROM va JOIN vc ON c_a = a_k
         JOIN vb ON c_k = b_j AND a_k < b_k""").head().getLong(0)
    assert(actual === 2L)
    assert(bounds(tree).last >= actual.toDouble)
  }

  test("derived constant filters: a filter on one equivalence-class " +
      "member applies to every member's probe relation (gw67 in miniature)") {
    import spark.implicits._
    // da-db-dc chained on one equivalence class {a_k ~ b_k ~ c_k}; the
    // constant filter sits on da ONLY. Execution pushes the substituted
    // predicate into db's and dc's scans (InferFiltersFromConstraints),
    // so the model's probe relations must see it too or every probed
    // count on db/dc overshoots the executed node (the r14 gw67 find:
    // probed 7 vs executed 2).
    Seq(1, 2, 3, 4).toDF("a_k").createOrReplaceTempView("da")
    Seq(1, 2, 3, 4, 4).toDF("b_k").createOrReplaceTempView("db")
    (1 to 4).flatMap(k => Seq.fill(k)(k)).toDF("c_k")
      .createOrReplaceTempView("dc")
    val sql = """SELECT count(*) AS n FROM da, db, dc
                 WHERE a_k = b_k AND b_k = c_k AND a_k < 3"""
    val q = QueryFacade(spark, sql)
    val graph = new JoinGraph(q.joinBlock.get, stats)
    // FULL-CLOSURE contract (r15): the filter derives onto BOTH class
    // members — including the 2-hop dc — because PlanEnforcer compiles
    // the closure into the enforced scans explicitly. Catalyst's own
    // InferFiltersFromConstraints runs one substitution round per plan
    // node, so whether dc's scan would get `c_k < 3` from Catalyst
    // alone depends on the enforced join order ((da⋈db)⋈dc: yes, via
    // the carried inferred constraint; (db⋈dc)⋈da: no) — the sw11
    // probed-3-executed-18 bug. Enforcing the closure makes executed
    // scans match probe relations by construction, under every order
    // (EnforcementSpec pins the compiled-scan side).
    for (t <- Seq("db", "dc"))
      assert(graph.derivedFilters(t).size === 1,
        s"$t: ${graph.derivedFilters(t)}")
    assert(graph.derivedFilters("da").isEmpty)
    val tree = new UESJoinOrderOptimizer().optimizeJoinOrder(q, graph).get
    val actual = spark.sql(sql).head().getLong(0)
    assert(actual === 3L) // 1*1*1 + 1*1*2 = 3
    assert(bounds(tree).last === 3.0,
      s"root bound ${bounds(tree).last} should be exact with derived filters")
  }

  test("fk expansion off an amplified pk side stays a true upper bound " +
      "(the r10 bug class in miniature)") {
    import spark.implicits._
    // p(p_k): [1,2] pk. f(f_k): [1,1,2] amplifies p (p1 appears twice).
    // g(g_k): [1,1,1,2,2]. Joining g on p_k after the amplification:
    // base statistics alone would claim min(baseCard(g)=5, U*mf=9)=5,
    // but 8 rows materialize — the exact unsoundness the JOB bound spec
    // caught. With multiplicity propagation alpha=mf(p_k)*mu(p)=2, so
    // the bound is min(3*3, 5*2, min(2,2)*2*3)=9 >= 8.
    Seq(1, 2).toDF("p_k").createOrReplaceTempView("up")
    Seq(1, 1, 2).toDF("f_k").createOrReplaceTempView("uf")
    Seq(1, 1, 1, 2, 2).toDF("g_k").createOrReplaceTempView("ug")
    val sql = """SELECT count(*) AS n FROM up, uf, ug
                 WHERE p_k = f_k AND p_k = g_k"""
    val q = QueryFacade(spark, sql)
    val graph = new JoinGraph(q.joinBlock.get, stats)
    // probes OFF: this fixture pins the per-relation MULTIPLICITY math
    // itself (with the probe ladder on, the value-ordered scheduler
    // counts every affordable step outright and the bound lands on the
    // actual — asserted after)
    val tree = new UESJoinOrderOptimizer(joinSketch = false)
      .optimizeJoinOrder(q, graph).get
    val actual = spark.sql(
      """SELECT count(*) AS n FROM up JOIN uf ON p_k = f_k
         JOIN ug ON p_k = g_k""").head().getLong(0)
    assert(actual === 8L)
    // start = up (card 2); uf and ug are symmetric candidates except for
    // cardinality: uf first (bound 3), then ug with the amplified alpha
    assert(tree.tables.map(_.identifier) === Seq("up", "uf", "ug"))
    assert(bounds(tree) === Seq(3.0, 9.0))
    assert(bounds(tree).last >= actual.toDouble)
    val probed = new UESJoinOrderOptimizer().optimizeJoinOrder(q, graph).get
    assert(bounds(probed).last === 8.0,
      s"probed path not exact: ${bounds(probed)}")
  }
}
