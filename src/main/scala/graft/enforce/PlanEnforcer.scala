package graft.enforce

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{And, Expression}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, HintInfo, Join,
  JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, SHUFFLE_HASH,
  SHUFFLE_MERGE, SHUFFLE_REPLICATE_NL}
import graft.core.JoinOperator
import graft.opt.JoinGraph
import graft.plans.{JoinNode, JoinTree, PhysicalOperatorAssignment, ScanNode}
import graft.qal.QueryFacade

/** Plan enforcement: compile a JoinTree + operator assignment back into the
  * query's Catalyst plan. This replaces the reference's hint-text backend
  * (pg_hint_plan Leading(...) walks, /root/reference/postbound/postgres.py:
  * 2210-2342) with direct plan reconstruction: the join block of the
  * analyzed plan is rebuilt in the prescribed shape, original leaf subtrees
  * (and thus attribute ids) are reused so the surrounding plan still
  * resolves, per-table filters are pushed onto the scans, and operator
  * choices become Catalyst join-strategy hints on the Join nodes.
  *
  * Join order holds because Catalyst preserves syntactic join order unless
  * CBO join reorder is enabled (it is off by default); operator hints are
  * honored by JoinSelection. AQE may still re-plan a physical strategy from
  * runtime sizes — disable AQE for strict shape experiments (SURVEY §7.4-1).
  */
object PlanEnforcer {

  private def strategyOf(op: JoinOperator): HintInfo = op match {
    case JoinOperator.BroadcastHashJoin |
         JoinOperator.IndexNestedLoopJoin => HintInfo(strategy = Some(BROADCAST))
    case JoinOperator.HashJoin => HintInfo(strategy = Some(SHUFFLE_HASH))
    case JoinOperator.SortMergeJoin => HintInfo(strategy = Some(SHUFFLE_MERGE))
    case JoinOperator.NestedLoopJoin => HintInfo(strategy = Some(SHUFFLE_REPLICATE_NL))
  }

  /** Scan-operator semantics on Spark (SURVEY §1.1 / §7.4-2): SeqScan is a
    * plain file scan; Index(-Only)Scan maps to scans with pushed predicates
    * and pruned columns (which Catalyst already does when a filter exists);
    * BitmapScan has no analog. Like the reference's MySQL backend
    * (/root/reference/postbound/mysql.py:1-30), unsupported or ineffective
    * hints produce warnings instead of errors.
    */
  def scanWarnings(graph: JoinGraph,
      ops: PhysicalOperatorAssignment): Seq[String] =
    ops.scanOperators.toSeq.sortBy(_._1).flatMap { case (table, op) =>
      val hasFilter = graph.block.filtersFor(table).nonEmpty
      op match {
        case graft.core.ScanOperator.BitmapScan =>
          Seq(s"$table: BitmapScan has no Spark analog; executing as file scan")
        case graft.core.ScanOperator.IndexScan |
             graft.core.ScanOperator.IndexOnlyScan if !hasFilter =>
          Seq(s"$table: ${op.name} requested but no predicate to push down")
        case _ => Nil
      }
    }

  /** Build the Catalyst plan for a join tree over the query's join graph.
    * Returns the reconstructed block (filters pushed, edges applied at the
    * deepest join where both sides are available, leftover multi-table
    * conjuncts and cycle edges applied on top).
    */
  def compile(graph: JoinGraph, tree: JoinTree[_],
      ops: PhysicalOperatorAssignment): LogicalPlan = {
    val block = graph.block
    var applied = Set.empty[Expression]

    def scanPlan(identifier: String): LogicalPlan = {
      val leaf = block.leafPlan(identifier)
      // own conjuncts PLUS the equivalence-class-derived constants
      // (JoinGraph.derivedFilters — logically implied, so results are
      // unchanged): compiling the closure explicitly makes every scan
      // match the bound model's probe relations BY CONSTRUCTION, under
      // every join order. Catalyst's own InferFiltersFromConstraints
      // only propagates one substitution hop per plan node, so a
      // multi-hop implied constant reaches a scan only under join
      // orders that stack the extra inference rounds — enforcement
      // must not leave that to chance (it also strictly helps the
      // executed plan: more rows pruned at the scan).
      val filters = block.filtersFor(identifier) ++
        graph.derivedFilters(identifier)
      QueryFacade.andAll(filters).map(Filter(_, leaf)).getOrElse(leaf)
    }

    // original edges plus the class-derived theta rewrites, applied at
    // the deepest join where they resolve — same implication argument
    // as the scan filters; the bound model's probe edges consult the
    // identical union (UesBoundModel.probeEdges)
    val enforceEdges = {
      val seen = scala.collection.mutable.Set.empty[Expression]
      (graph.edges ++ graph.derivedThetaEdges).filter(e =>
        seen.add(e.expr.canonicalized))
    }

    def build(t: JoinTree[_]): (LogicalPlan, Set[String]) = t match {
      case ScanNode(table, _) =>
        (scanPlan(table.identifier), Set(table.identifier))
      case JoinNode(outer, inner, _) =>
        val (lp, lts) = build(outer)
        val (rp, rts) = build(inner)
        val all = lts ++ rts
        val conds = enforceEdges
          .filterNot(e => applied.contains(e.expr))
          .filter(e => e.tables.subsetOf(all) &&
            e.tables.exists(lts.contains) && e.tables.exists(rts.contains))
        applied ++= conds.map(_.expr)
        val cond = QueryFacade.andAll(conds.map(_.expr))
        val hint = ops.operatorFor(all)
          .map(op => JoinHint(None, Some(strategyOf(op))))
          .getOrElse(JoinHint.NONE)
        (Join(lp, rp, Inner, cond, hint), all)
    }

    val (joined, _) = build(tree)
    // leftovers: cycle edges not applied inside the tree + 3+-table
    // conjuncts + constant predicates
    val leftovers =
      graph.edges.map(_.expr).filterNot(applied.contains) ++
        graph.postJoinPredicates ++ block.constantFilters
    leftovers.reduceOption(And).map(Filter(_, joined)).getOrElse(joined)
  }

  /** Enforce: reconstruct the block and splice it into the full query. */
  def enforce(q: QueryFacade, graph: JoinGraph, tree: JoinTree[_],
      ops: PhysicalOperatorAssignment = PhysicalOperatorAssignment()): DataFrame =
    q.withEnforcedBlock(compile(graph, tree, ops))
}
