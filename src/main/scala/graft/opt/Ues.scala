package graft.opt

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, ExprId, Expression}
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LogicalPlan}
import graft.core.{Cardinality, JoinOperator}
import graft.pipeline.{JoinOrderOptimization, PhysicalOperatorSelection,
  ParameterGeneration}
import graft.plans.{JoinNode, JoinTree, PhysicalOperatorAssignment,
  PlanParameterization, ScanNode}
import graft.qal.QueryFacade

/** UES-flavored pessimistic join ordering (reference: UESJoinOrderOptimizer,
  * /root/reference/postbound/opt/ues.py:959, bounds at :724-783; the
  * algorithm follows the CIDR'21 paper "Simplicity Done Right").
  *
  * Greedy construction of a left-deep tree that minimizes the upper bound of
  * every intermediate:
  *  - n:m edge bound:  |L ⋈a=b R| <= min(d(a), d(b)) * mf_L(a) * mf(b),
  *    additionally capped by U(L) * mf(b) (each of the at-most-U(L) rows on
  *    the build side matches at most mf(b) probe rows);
  *  - pk/fk edge bound: falls out of the same formulas because a pk
  *    column's max frequency is 1 (pk candidate => U unchanged; fk
  *    candidate off a fresh pk side => the fk side's filtered cardinality).
  * mf_L is the PROPAGATED max frequency inside the intermediate — base
  * max frequency times the table's tracked row multiplicity — the
  * reference's MaxFrequencyStats design (ues.py:300); see the bound
  * derivation at [[optimizeJoinOrder]]'s stepFor. Statistics come from
  * the emulated stats provider: filtered base-table cardinalities,
  * per-join-column distinct counts and maximum frequencies.
  */
/** The UES bound machinery, shared by [[UESJoinOrderOptimizer]] (greedy
  * order construction) and [[PessimisticCardinalityEstimator]] (the bound
  * as a pluggable estimate for the textbook pipelines). All semantics and
  * soundness arguments live in the comments below; the optimizer's
  * scaladoc explains the flags.
  */
private[opt] final class UesBoundModel(graph: JoinGraph,
    filteredStats: Boolean = true, mcvEdgeBounds: Boolean = true,
    mcvK: Int = 16, joinSketch: Boolean = true) {
  private val stats = graph.stats
  private def leaf(t: String) = graph.block.leafPlan(t)
  // the plan frequency probes run on: with filteredStats the table's
  // filter predicates are applied first, so mf/ndv/MCV describe the
  // relation that actually participates in the joins (exact, hence
  // sound -- unlike selectivity-scaled base frequencies)
  private def statPlan(t: String): LogicalPlan =
    if (!filteredStats) leaf(t)
    else QueryFacade.andAll(graph.block.filtersFor(t))
      .map(Filter(_, leaf(t))).getOrElse(leaf(t))
  def baseCard(t: String): Double =
    stats.rowCount(leaf(t),
      QueryFacade.andAll(graph.block.filtersFor(t))).toDouble
  def mf(t: String, c: String): Double =
    stats.maxFrequency(statPlan(t), c).toDouble
  private def ndv(t: String, c: String): Double =
    stats.distinctCount(statPlan(t), c).toDouble

  // Max-frequency propagation through intermediates (the reference's
  // MaxFrequencyStats design, /root/reference/postbound/opt/ues.py:300):
  // alongside the running bound U we track, per joined table t, a
  // row-MULTIPLICITY bound mu(t) -- the max number of times one base row
  // of t can appear in the current intermediate. The max frequency of
  // column (t,c) inside the intermediate is then <= mf_base(t,c) *
  // mu(t); that propagated frequency is what makes the fk-candidate and
  // n:m bound terms sound after row-amplifying joins (the JOB bound
  // spec caught raw base statistics claiming 25 where 225 materialized,
  // after a cross-table OR edge amplified the pk side). Base ndv stays
  // valid as-is: distinct counts only shrink inside an intermediate.
  //
  // Joining candidate `c` into L over its (simultaneous) edges:
  //   beta  = min(baseCard(c), min over equi edges of mf_base(c, cb))
  //           -- one L row matches at most beta candidate rows
  //   alpha = min(U, min over equi edges of mf_base(l, ca) * mu(l))
  //           -- one candidate row matches at most alpha L rows
  //   U'    = min( U * beta,
  //                baseCard(c) * alpha,
  //                per equi edge: min(ndv(l,ca), ndv(c,cb))
  //                  * mf_base(l,ca)*mu(l) * mf_base(c,cb) )
  //   mu'(t) = mu(t) * beta for t in L;   mu'(c) = alpha
  // Pure theta/cross edges carry no per-row cap, so beta/alpha take the
  // baseCard/U fallbacks. pk columns need no special casing: their base
  // max frequency is 1, which reproduces the classic pk/fk rules
  // (pk candidate => U' = U; fk candidate off a fresh pk side =>
  // U' = baseCard(c)).
  import UesBoundModel.Step

  // MCV-aware edge bound (rearrangement inequality): the join output
  // over one equi edge is at most sum_i fl^(i) * fc^(i), pairing the
  // two sides' per-value frequency vectors sorted descending -- the
  // worst-case value alignment. The top-k frequencies of each side are
  // known exactly from the MCV probe; the unseen tail is charged three
  // independent sound caps and takes their min:
  //   per-value  <= the k-th MCV frequency (vectors are sorted),
  //   total mass <= cardinality - MCV prefix mass (frequencies sum to
  //                 the relation size),
  //   #values    <= min(ndv_l, ndv_c) - k.
  // The l side lives inside the running intermediate: its per-value
  // frequencies scale by the multiplicity mu(l) and cap at U, its total
  // mass caps at U; the candidate side caps at its filtered cardinality.
  private def mcvTerm(l: String, ca: String, muL: Double, u: Double,
      c: String, cb: String): Double = {
    val fl = stats.mcvFrequencies(statPlan(l), ca, mcvK).map(_.toDouble)
    val fc = stats.mcvFrequencies(statPlan(c), cb, mcvK).map(_.toDouble)
    if (fl.isEmpty || fc.isEmpty) return 0.0 // an empty side joins nothing
    val cardC = baseCard(c)
    val cardL = if (filteredStats) baseCard(l) else
      stats.rowCount(leaf(l)).toDouble
    val m = math.min(ndv(l, ca), ndv(c, cb))
    val k = math.min(math.min(fl.size, fc.size).toDouble, m).toInt
    val top = (0 until k).map(i =>
      math.min(fl(i) * muL, u) * math.min(fc(i), cardC)).sum
    val tailCount = math.max(0.0, m - k)
    if (tailCount == 0.0) return top
    // k >= 1 here (fl/fc nonempty and m >= 1 when a tail exists)
    val flTail = if (k < fl.size) fl(k) else fl(k - 1)
    val fcTail = if (k < fc.size) fc(k) else fc(k - 1)
    val massL = math.min(u, math.max(0.0, cardL - fl.take(k).sum) * muL)
    val massC = math.min(cardC, math.max(0.0, cardC - fc.take(k).sum))
    top + Seq(math.min(fcTail, cardC) * massL,
      math.min(flTail * muL, u) * massC,
      tailCount * math.min(flTail * muL, u) * math.min(fcTail, cardC)).min
  }

  // Join-sketch probe (the estimator tier between the per-relation UES
  // statistics and PreciseCardinalities, reference: true-cardinality
  // probes in /root/reference/postbound/opt/_cardinalities.py:20): the
  // number of candidate rows that can appear in the intermediate over
  // joined+c at all. Per-relation statistics provably cannot see
  // cross-table join-value selectivity (the q09-class semijoin tail:
  // the intermediate's (order, supplier) pairs almost never co-occur in
  // lineitem); the sound quantity that CAN be probed on filtered base
  // relations is the Yannakakis-style semijoin reduction of the
  // candidate against the joined subset: c left-semi-joined with each
  // equi partner in S, each partner itself reduced against ITS
  // S-neighbors, transitively. Soundness: a candidate row in the
  // intermediate over S+c has, for every table of S reachable through
  // subset equi edges, a witness row satisfying those edges — so it
  // survives the reduction; the reduction count is a true upper bound
  // on participating candidate rows, and reducedCard * alpha (each
  // surviving row matches at most alpha intermediate rows) is a sound
  // step cap. The probe is ONE count over a left-semi join tree of
  // filtered scans — at scale each semijoin is a broadcast/shuffle of
  // distinct-key sets, and the result is a Long that memoizes and
  // disk-persists exactly like the mcvf vectors. When even that shuffle
  // is unaffordable, stats.bloomSemijoinCount is the documented
  // alternative: Bloom-filter membership (one pass per side, no
  // distinct-set join) whose false positives can only OVERcount — the
  // sound direction — at the cost of dropping the tree's transitivity
  // (also an enlargement, also sound).
  //
  // Tables may repeat across branches (q09's region sits under both
  // nation aliases): a repeated occurrence is wrapped in a Project of
  // fresh Aliases and the edge predicate remapped to the alias ids, so
  // the analyzer's relation dedup re-instances the duplicated subtree
  // consistently (the same mechanism that resolves df.join(df)).
  // Occurrences are capped at 2 per table and depth 8 so dense graphs
  // cannot blow the tree up (dropping a semijoin condition is always
  // sound). Returns None when no filter exists anywhere in the
  // reduction tree — the probe could then only discover FK orphans,
  // not selectivity, and is not worth a job.
  private def reductionPlan(c: String, s: Set[String]): Option[LogicalPlan] = {
    val used = scala.collection.mutable.Map.empty[String, Int]
      .withDefaultValue(0)
    var anyFilter = false
    def remap(e: Expression, m: Map[ExprId, Attribute]): Expression =
      if (m.isEmpty) e
      else e.transform { case a: Attribute if m.contains(a.exprId) => m(a.exprId) }
    def instantiate(t: String): (LogicalPlan, Map[ExprId, Attribute]) = {
      used(t) += 1
      // only filters that statPlan actually APPLIES make the probe
      // informative: with filteredStats off the tree is filterless and
      // could only discover FK orphans — skip it entirely
      if (t != c && filteredStats && graph.block.filtersFor(t).nonEmpty)
        anyFilter = true
      if (used(t) == 1) (statPlan(t), Map.empty)
      else {
        // A REPEATED occurrence re-aliases the whole filtered subtree
        // through a Project of fresh Aliases: the edge predicate built
        // against this occurrence references the new alias ids, while the
        // duplicated subtree underneath keeps its original ids — the
        // analyzer's relation dedup then re-instances that inner subtree
        // consistently (the same mechanism that resolves df.join(df)),
        // leaving the alias ids this occurrence's predicate uses intact.
        val orig = statPlan(t)
        val aliases = orig.output.map(a =>
          org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)())
        val fresh = org.apache.spark.sql.catalyst.plans.logical
          .Project(aliases, orig)
        (fresh, orig.output.map(_.exprId).zip(fresh.output).toMap)
      }
    }
    def canInstantiate(t: String): Boolean = used(t) < 2
    def grow(t: String, plan0: LogicalPlan, subst: Map[ExprId, Attribute],
        path: Set[String]): LogicalPlan = {
      var p = plan0
      if (path.size >= 8) return p
      for (u <- s.toSeq.sorted if !path.contains(u) && canInstantiate(u)) {
        val eqEdges = graph.edges
          .filter(e => e.connects(t, u) && e.equiColumns.nonEmpty)
        if (eqEdges.nonEmpty) {
          val (uPlan, uSubst) = instantiate(u)
          val uGrown = grow(u, uPlan, uSubst, path + t + u)
          val cond = eqEdges.map(e => remap(remap(e.expr, subst), uSubst))
            .reduce(And(_, _))
          p = Join(p, uGrown, LeftSemi, Some(cond), JoinHint.NONE)
        }
      }
      p
    }
    val (cPlan, cSubst) = instantiate(c)
    val tree = grow(c, cPlan, cSubst, Set(c))
    if (anyFilter && !(tree eq cPlan)) Some(tree) else None
  }

  /** Candidate SELECTION deliberately uses the same PROBED bound as the
    * chosen step: a probe-free selector was measured (r12) to pick a
    * worse order on the q09-class queries (kit max q-error 61 -> 630 —
    * the probes are precisely what tells the greedy that deferring the
    * n:m fact is safe), and the probe cost is one-time per data
    * fingerprint (memoized + disk-persisted), the same amortization as
    * the reference's precomputed catalog statistics. */
  def selectionBound(joined: Set[String], u: Double, mu: Map[String, Double],
      c: String): Double = stepFor(joined, u, mu, c).bound

  /** Probed upper bound on candidate rows that can reach the joined set
    * at all (see [[reductionPlan]]); None when the probe is disabled or
    * would be uninformative. */
  def reducedCard(c: String, joined: Set[String]): Option[Double] =
    if (!joinSketch) None
    else try reductionPlan(c, joined).map(p => stats.rowCount(p).toDouble)
    catch {
      // a probe failure (unresolvable clone, exotic leaf) must degrade
      // to the per-relation bound, never fail the optimization
      case _: Throwable => None
    }

  def stepFor(joined: Set[String], u: Double, mu: Map[String, Double],
      c: String): Step = {
    val equi = graph.edgesBetween(joined, c).flatMap { e =>
      val l = (e.tables - c).head
      for (ca <- e.columnOf(l); cb <- e.columnOf(c)) yield (l, ca, cb)
    }
    // Tuple refinement for simultaneous edges: one L row fixes a VALUE
    // for every edge column at once, so the candidate rows matching it
    // all share the full column tuple -- bounded by the tuple max
    // frequency, which sees the conjunction the per-edge minimum
    // cannot (a lineitem self-join pairing on supplier AND part has
    // per-edge frequencies ~30 but tuple frequency ~5). Symmetrically
    // for alpha when several edge columns live on the SAME joined
    // table (then the tuple is probeable; cross-table tuples are not).
    val betaTuple = {
      val cols = equi.map(_._3.name).distinct
      if (cols.size >= 2) Seq(stats.maxFrequency(statPlan(c), cols).toDouble)
      else Seq.empty
    }
    val alphaTuple = equi.groupBy(_._1).toSeq.collect {
      case (l, es) if es.map(_._2.name).distinct.size >= 2 =>
        stats.maxFrequency(statPlan(l),
          es.map(_._2.name).distinct).toDouble * mu(l)
    }
    // candidate rows that can participate at all: the filtered base
    // cardinality, tightened by the join-sketch reduction probe when
    // one is informative (min keeps soundness under any probe regime)
    val cardC =
      if (equi.isEmpty) baseCard(c)
      else reducedCard(c, joined).map(math.min(_, baseCard(c)))
        .getOrElse(baseCard(c))
    val beta = (equi.map { case (_, _, cb) => mf(c, cb.name) } ++
      betaTuple :+ cardC).min
    val alpha = (equi.map { case (l, ca, _) =>
      mf(l, ca.name) * mu(l) } ++ alphaTuple :+ u).min
    val nm = equi.map { case (l, ca, cb) =>
      math.min(ndv(l, ca.name), ndv(c, cb.name)) *
        mf(l, ca.name) * mu(l) * mf(c, cb.name)
    }
    val mcv = if (!mcvEdgeBounds) Seq.empty else equi.map {
      case (l, ca, cb) => mcvTerm(l, ca.name, mu(l), u, c, cb.name)
    }
    // Partner re-reduction (the reverse direction of the candidate cap,
    // for the "filtered dimension joins last" pattern where beta = 1
    // keeps U flat while the actual collapses): every row of the new
    // intermediate contains a row of partner l that has Yannakakis
    // witnesses in (joined ∪ c) \ {l} — including the NEW candidate and
    // its filters — so at most reducedCard(l, joined - l + c) distinct
    // l-rows participate, each at most mu'(l) = mu(l) * beta times.
    val partnerRecheck = if (!joinSketch) Seq.empty else
      equi.map(_._1).distinct.flatMap { l =>
        reducedCard(l, joined - l + c).map(k => k * mu(l) * beta)
      }
    Step((Seq(u * beta, cardC * alpha) ++ nm ++ mcv ++ partnerRecheck).min,
      beta, alpha)
  }

  /** Greedy pessimistic upper bound on the join over exactly `ts` --
    * same expansion rule as the optimizer, restricted to the subset.
    * Tables unreachable through any edge enter as a cross product
    * (each L row pairs with every row of the newcomer: bound and
    * multiplicities multiply accordingly -- still a true upper bound).
    */
  // memo for the DP use-case (every connected subset is asked for):
  // scoped to THIS model instance, so the key is just the table set —
  // no cross-graph collision is possible and entries die with the model
  private val subsetMemo =
    scala.collection.concurrent.TrieMap.empty[Set[String], Double]
  def boundForSubsetMemo(ts: Set[String]): Double =
    subsetMemo.getOrElseUpdate(ts, boundForSubset(ts))

  def boundForSubset(ts: Set[String]): Double = {
    if (ts.isEmpty) return 1.0
    if (ts.size == 1) return math.max(baseCard(ts.head), 1.0)
    val start = ts.minBy(baseCard)
    var joined = Set(start)
    var bound = math.max(baseCard(start), 1.0)
    var mu = Map(start -> 1.0)
    while (joined.size < ts.size) {
      val free = ts.diff(joined)
      val cands = free.filter(t => graph.edgesBetween(joined, t).nonEmpty)
      if (cands.isEmpty) {
        val next = free.minBy(baseCard)
        val cardN = math.max(baseCard(next), 1.0)
        mu = mu.map { case (t, m) => t -> m * cardN } + (next -> bound)
        bound = bound * cardN
        joined += next
      } else {
        val next = cands.minBy(c => selectionBound(joined, bound, mu, c))
        val step = stepFor(joined, bound, mu, next)
        mu = mu.map { case (t, m) => t -> m * step.beta } +
          (next -> step.alpha)
        bound = math.max(step.bound, 1.0)
        joined += next
      }
    }
    bound
  }
}

private[opt] object UesBoundModel {
  /** One greedy expansion step: the new intermediate bound plus the
    * per-row match caps used for the multiplicity update (beta: max
    * candidate rows per L row; alpha: max L rows per candidate row). */
  final case class Step(bound: Double, beta: Double, alpha: Double)
}

  /** @param subqueryBranching UES branching policy (reference:
    *   ues.py subquery generation): when an n:m table enters the join
    *   order, its still-free pk-side partners are folded into a bushy
    *   sub-branch first — the pk/fk joins only filter that table, so
    *   applying them before the n:m join tightens the intermediate without
    *   changing the bound math. Off = plain left-deep (reference default).
    * @param filteredStats probe frequency statistics (mf/ndv/MCV) on the
    *   FILTERED base relations instead of the raw tables. The reference
    *   scales base max frequencies by filter selectivity (ues.py's
    *   frequency adjustment) — a heuristic that can UNDERestimate when a
    *   filter keeps the hot value. Our emulated-stats provider can probe
    *   the filtered relation exactly (memoized + disk-persisted, one
    *   aggregation job per new (table, filter, column)), which keeps the
    *   bound a true upper bound while capturing the same tightening.
    * @param mcvEdgeBounds add a most-common-values edge term to the n:m
    *   bound: instead of charging every one of the min(ndv) matching
    *   values the global max frequency on BOTH sides, pair the sorted
    *   per-value frequency vectors (rearrangement inequality — the
    *   worst-case alignment) using the exact top-[[mcvK]] frequencies and
    *   three sound caps on the unseen tail (per-value <= the k-th MCV
    *   frequency, total mass <= cardinality minus the MCV prefix mass,
    *   value count <= min ndv). This is the pessimistic-estimator
    *   refinement of the sketch-bound literature (compare the reference's
    *   MostCommonValues statistic, db/_db.py:1600) and only ever tightens:
    *   the term joins the existing min(...), never replaces it.
    */
final class UESJoinOrderOptimizer(subqueryBranching: Boolean = false,
    filteredStats: Boolean = true, mcvEdgeBounds: Boolean = true,
    mcvK: Int = 16, joinSketch: Boolean = true)
    extends JoinOrderOptimization {
  def describe: String =
    s"""{"name":"ues","tree":"${if (subqueryBranching) "bushy" else "left-deep"}","bounds":"pessimistic","filteredStats":$filteredStats,"mcv":$mcvEdgeBounds,"joinSketch":$joinSketch}"""

  def optimizeJoinOrder(q: QueryFacade, graph: JoinGraph): Option[JoinTree[Cardinality]] = {
    val tables = graph.tables
    // pure theta edges are fine as long as the EQUI subgraph connects all
    // tables: they fall back to the baseCard/U caps in the model's
    // stepFor and are enforced as residual predicates; the greedy
    // expansion itself always has an equi edge available
    if (tables.size < 2 || !graph.isEquiConnected) return None

    val model = new UesBoundModel(graph, filteredStats, mcvEdgeBounds, mcvK,
      joinSketch)
    import model.{baseCard, mf, stepFor}

    val start = tables.minBy(baseCard)
    var tree: JoinTree[Cardinality] =
      ScanNode(graph.block.tables.find(_.identifier == start).get,
        Cardinality(baseCard(start)))
    var joined = Set(start)
    var bound = baseCard(start)
    // the bare (filtered) start table: every base row appears at most once
    var mu = Map(start -> 1.0)

    // free pk-side partners of `c`: joined to c on a column where the
    // partner is the pk side, and connected to nothing else outside
    def pkPartners(c: String, taken: Set[String]): Seq[String] =
      graph.tables.filterNot(taken.contains).filter(_ != c).filter { d =>
        val edgesCd = graph.edges.filter(_.connects(c, d))
        edgesCd.nonEmpty && edgesCd.forall { e =>
          e.columnOf(d).exists(cd => graph.isPrimaryKey(d, cd.name))
        } && graph.edges.filter(_.tables.contains(d))
          .forall(e => (e.tables - d).subsetOf(Set(c)))
      }

    while (joined.size < tables.size) {
      val candidates = graph.neighbors(joined)
      if (candidates.isEmpty) return None // disconnected graph
      val next = candidates.minBy(c => model.selectionBound(joined, bound, mu, c))
      val step = stepFor(joined, bound, mu, next)
      val uPrev = bound
      var taken = joined + next
      val partners =
        if (subqueryBranching) pkPartners(next, taken) else Seq.empty
      // the reference's subquery payoff: the folded pk partners
      // SEMIJOIN-reduce the n:m table before the top join, so the
      // candidate rows that can reach L number at most the branch
      // fragment's own bound B (the shared model bounds the
      // c ⋈ partners join over the subset). Sound step refinements:
      //   |L ⋈ c'| <= B * alpha  (each surviving c row matches at most
      //                           alpha L rows)
      //   |L ⋈ c'| <= U * B      (each L row matches at most |c'|
      //                           candidate rows)
      // Both join the existing min, so branching tightens
      // filtered-partner chains instead of merely reshaping them.
      bound = math.max(
        if (partners.isEmpty) step.bound
        else {
          val b = model.boundForSubset(partners.toSet + next)
          Seq(step.bound, b * step.alpha, uPrev * b).min
        }, 1.0)
      mu = mu.map { case (t, m) => t -> m * step.beta } + (next -> step.alpha)
      var branch: JoinTree[Cardinality] =
        ScanNode(graph.block.tables.find(_.identifier == next).get,
          Cardinality(baseCard(next)))
      partners.foreach { d =>
        val scanD = ScanNode(graph.block.tables.find(_.identifier == d).get,
          Cardinality(baseCard(d)))
        // pk joins never increase the branch bound; the partner's rows
        // appear at most once per matching `next` row, so its
        // multiplicity is next's multiplicity times next's fk-column
        // frequency (fallback: the whole intermediate)
        val dMu = (graph.edges.filter(_.connects(next, d))
          .flatMap(_.columnOf(next))
          .map(cf => step.alpha * mf(next, cf.name)) :+ bound).min
        mu += (d -> dMu)
        branch = JoinNode(branch, scanD, branch.annotation)
        taken += d
      }
      tree = JoinNode(tree, branch, Cardinality(bound))
      joined = taken
    }
    Some(tree)
  }
}

/** UES operator rule: never use nested-loop joins; hash-join everywhere,
  * broadcasting sides whose bound is small (reference: UESOperatorSelection,
  * /root/reference/postbound/opt/ues.py:1558 disables NLJ globally).
  */
final class UESOperatorSelection(broadcastThreshold: Double = 100000.0)
    extends PhysicalOperatorSelection {
  def describe: String =
    s"""{"name":"ues-operators","nlj":"disabled","broadcastBound":$broadcastThreshold}"""

  def selectPhysicalOperators(q: QueryFacade, graph: JoinGraph,
      joinOrder: Option[JoinTree[Cardinality]]): PhysicalOperatorAssignment = {
    val base = PhysicalOperatorAssignment(
      disabledJoinOps = Set(JoinOperator.NestedLoopJoin),
      defaultJoin = Some(JoinOperator.HashJoin))
    joinOrder match {
      case None => base
      case Some(tree) =>
        def assign(t: JoinTree[Cardinality],
            acc: PhysicalOperatorAssignment): PhysicalOperatorAssignment = t match {
          case _: ScanNode[_] => acc
          case j @ JoinNode(outer, inner, _) =>
            val innerSmall = inner.annotation.value <= broadcastThreshold
            val op = if (innerSmall) JoinOperator.BroadcastHashJoin
              else JoinOperator.HashJoin
            assign(inner, assign(outer, acc.withJoin(j.tableSet, op)))
        }
        assign(tree, base)
    }
  }
}

/** Parameterization from the join tree's bound annotations (reference:
  * ParameterGeneration producing Rows(...) hints, _hints.py:632). */
final class BoundsParameterGeneration extends ParameterGeneration {
  def describe: String = """{"name":"ues-bounds-params"}"""
  def generatePlanParameters(q: QueryFacade, graph: JoinGraph,
      joinOrder: Option[JoinTree[Cardinality]],
      operators: PhysicalOperatorAssignment): PlanParameterization =
    joinOrder match {
      case None => PlanParameterization()
      case Some(tree) =>
        def collect(t: JoinTree[Cardinality]): Map[Set[String], Cardinality] =
          t match {
            case _: ScanNode[_] => Map.empty
            case j @ JoinNode(o, i, a) =>
              collect(o) ++ collect(i) + (j.tableSet -> a)
          }
        PlanParameterization(cardinalityHints = collect(tree))
    }
}

/** The UES upper bound as a pluggable cardinality estimator — estimator
  * composability with the textbook pipelines (reference: estimators are
  * interchangeable stage inputs, /root/reference/postbound/opt/
  * _cardinalities.py; the bound formulas, ues.py:724-783). A DP
  * enumeration minimizing C_out over THIS estimator searches bushy plans
  * by worst-case intermediate size: estimates are sound upper bounds,
  * never the underestimates that make a cost model pick an exploding
  * plan. Subset bounds are memoized per join graph (DP asks for every
  * connected subset).
  */
/** @param joinSketch default OFF here (unlike the greedy optimizer): a
  *   DP enumeration asks for every connected subset, and a semijoin
  *   probe per (candidate, subset) pair multiplies the probe count by
  *   the subset lattice. The greedy path already pays candidates x
  *   steps x (1 + equi partners) probes per query (~8 s one-time on a
  *   cold cache at sf0.1, measured r12 — each (candidate, prefix) pair
  *   is a distinct memo key); a DP would square that. */
final class PessimisticCardinalityEstimator(filteredStats: Boolean = true,
    mcvEdgeBounds: Boolean = true, mcvK: Int = 16,
    joinSketch: Boolean = false)
    extends graft.pipeline.CardinalityEstimator {
  def describe: String =
    s"""{"name":"pessimistic-card","model":"ues-bounds","mcv":$mcvEdgeBounds}"""

  def calculateEstimate(graph: JoinGraph, tables: Set[String]): Cardinality = {
    // the model (and its subset memo) is attached to the graph itself,
    // so its lifetime is exactly the graph's — a WeakHashMap here would
    // not work: the model strongly references its graph, so a
    // map-held value would keep its own weak key alive forever
    val model = graph.attachments.getOrElseUpdate(
      s"uesModel[$filteredStats,$mcvEdgeBounds,$mcvK,$joinSketch]",
      new UesBoundModel(graph, filteredStats, mcvEdgeBounds, mcvK,
        joinSketch)).asInstanceOf[UesBoundModel]
    Cardinality(model.boundForSubsetMemo(tables))
  }
}
