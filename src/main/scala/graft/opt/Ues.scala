package graft.opt

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
  *  - n:m edge bound:  |L ⋈a=b R| <= min(d(a), d(b)) * mf(a) * mf(b),
  *    additionally capped by U(L) * mf(b) (each of the at-most-U(L) rows on
  *    the build side matches at most mf(b) probe rows);
  *  - pk/fk edge bound: the fk side's (filtered) cardinality — every fk row
  *    matches at most one pk row.
  * Statistics come from the emulated stats provider: filtered base-table
  * cardinalities, per-join-column distinct counts and maximum frequencies
  * (MaxFrequencyStats, ues.py:300). Simplification vs the reference: no
  * subquery-branching policies — always left-deep (the reference default).
  */
  /** @param subqueryBranching UES branching policy (reference:
    *   ues.py subquery generation): when an n:m table enters the join
    *   order, its still-free pk-side partners are folded into a bushy
    *   sub-branch first — the pk/fk joins only filter that table, so
    *   applying them before the n:m join tightens the intermediate without
    *   changing the bound math. Off = plain left-deep (reference default).
    */
final class UESJoinOrderOptimizer(subqueryBranching: Boolean = false)
    extends JoinOrderOptimization {
  def describe: String =
    s"""{"name":"ues","tree":"${if (subqueryBranching) "bushy" else "left-deep"}","bounds":"pessimistic"}"""

  def optimizeJoinOrder(q: QueryFacade, graph: JoinGraph): Option[JoinTree[Cardinality]] = {
    val tables = graph.tables
    // pure theta edges are fine as long as the EQUI subgraph connects all
    // tables: they contribute the cross-product fallback bound in
    // edgeBound's `case _` and are enforced as residual predicates; the
    // greedy expansion itself always has an equi edge available
    if (tables.size < 2 || !graph.isEquiConnected) return None

    val stats = graph.stats
    def leaf(t: String) = graph.block.leafPlan(t)
    def baseCard(t: String): Double =
      stats.rowCount(leaf(t),
        QueryFacade.andAll(graph.block.filtersFor(t))).toDouble
    def mf(t: String, c: String): Double =
      stats.maxFrequency(leaf(t), c).toDouble
    def ndv(t: String, c: String): Double =
      stats.distinctCount(leaf(t), c).toDouble

    // Soundness bookkeeping the simplified bound math needs: the set of
    // already-joined tables whose rows are still DISTINCT inside the
    // current intermediate (each base row appears at most once). The
    // base-table statistics terms — baseCard(cand) in the fk-candidate
    // case, and the ndv*mf*mf n:m product — are upper bounds only while
    // the left table's rows are un-amplified; once a table entered
    // through a row-multiplying join (n:m, cross/theta, fk expansion),
    // its pk values repeat in the intermediate and those terms can
    // UNDERestimate (found by the JOB bound spec on the cross-table
    // OR-disjunction kit query: bound 25 vs actual 225). The reference
    // solves this by propagating max frequencies through intermediates
    // (ues.py MaxFrequencyStats); tracking uniqueness is the minimal
    // sound version — the always-sound uLeft * mf(cand) cap remains
    // available in every case.
    // Per edge: (bound, uniqueness guarantee of the edge's join result).
    // Guarantees compose by UNION across simultaneous edges: predicates
    // only shrink the row set further, and "appears at most once"
    // survives on any subset.
    def edgeBound(uLeft: Double, leftTable: String, cand: String,
        edge: JoinEdge, unique: Set[String]): (Double, Set[String]) = {
      (edge.columnOf(leftTable), edge.columnOf(cand)) match {
        case (Some(ca), Some(cb)) =>
          if (graph.isPrimaryKey(cand, cb.name)) {
            // each intermediate row matches at most one pk row: row set
            // does not grow, existing uniqueness survives
            (uLeft, unique)
          } else if (graph.isPrimaryKey(leftTable, ca.name)) {
            val cap = uLeft * mf(cand, cb.name)
            if (unique(leftTable))
              // pk side unique in L => each cand row matches <= 1 L row:
              // at most baseCard(cand) rows, and cand comes out distinct
              (math.min(baseCard(cand), cap), Set(cand))
            else (cap, Set.empty)
          } else {
            val cap = uLeft * mf(cand, cb.name)
            val nm = math.min(ndv(leftTable, ca.name), ndv(cand, cb.name)) *
              mf(leftTable, ca.name) * mf(cand, cb.name)
            // the base-stats n:m product is sound only while leftTable's
            // frequencies are un-amplified in the intermediate
            (if (unique(leftTable)) math.min(nm, cap) else cap, Set.empty)
          }
        case _ => (uLeft * baseCard(cand), Set.empty)
      }
    }

    // bound of joining candidate c into the current set: min bound over
    // edges; uniqueness guarantee = union over ALL edges (they all apply)
    def joinBoundWithUnique(joined: Set[String], u: Double, c: String,
        unique: Set[String]): (Double, Set[String]) = {
      val per = graph.edgesBetween(joined, c).map { e =>
        val leftTable = (e.tables - c).head
        edgeBound(u, leftTable, c, e, unique)
      }
      (per.map(_._1).min, per.map(_._2).reduce(_ ++ _))
    }
    def joinBound(joined: Set[String], u: Double, c: String,
        unique: Set[String]): Double =
      joinBoundWithUnique(joined, u, c, unique)._1

    val start = tables.minBy(baseCard)
    var tree: JoinTree[Cardinality] =
      ScanNode(graph.block.tables.find(_.identifier == start).get,
        Cardinality(baseCard(start)))
    var joined = Set(start)
    var bound = baseCard(start)
    // the bare (filtered) start table is trivially duplicate-free
    var unique = Set(start)

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
      val next = candidates.minBy(c => joinBound(joined, bound, c, unique))
      val (nextBound, nextUnique) =
        joinBoundWithUnique(joined, bound, next, unique)
      bound = math.max(nextBound, 1.0)
      unique = nextUnique
      var branch: JoinTree[Cardinality] =
        ScanNode(graph.block.tables.find(_.identifier == next).get,
          Cardinality(baseCard(next)))
      var taken = joined + next
      if (subqueryBranching) {
        pkPartners(next, taken).foreach { d =>
          val scanD = ScanNode(graph.block.tables.find(_.identifier == d).get,
            Cardinality(baseCard(d)))
          // pk joins never increase the branch bound
          branch = JoinNode(branch, scanD, branch.annotation)
          taken += d
        }
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
