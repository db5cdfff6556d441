package graft.opt

import scala.collection.mutable
import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.core.{Cardinality, JoinOperator}
import graft.pipeline.PhysicalOperatorSelection
import graft.plans.{JoinNode, JoinTree, PhysicalOperatorAssignment, QueryPlanOps, ScanNode}
import graft.qal.QueryFacade

/** TONIC-style learned operator selection (reference: TonicOperatorSelection
  * + QEP-S, /root/reference/postbound/opt/tonic.py:314,889,1270; VLDB'22).
  *
  * The QEP-S is a prefix trie over left-deep join orders: a path
  * t1 -> t2 -> ... -> tk identifies the intermediate "join t_k into the
  * prefix", and each node keeps the best observed cost per physical join
  * operator. Recommendation walks the query's join order through the trie
  * and picks the cheapest recorded operator per step (falling back when a
  * prefix was never seen); learning feeds measured per-join costs from the
  * executed Spark plan back into the trie (SQLMetric numOutputRows as the
  * C_out-style cost proxy — no timing noise, scale-independent).
  *
  * Bushy plans are canonicalized the way the reference canonicalizes
  * QEPs before trie insertion (tonic.py QEPsNode path construction): the
  * trie path follows the outer spine, and each inner branch contributes
  * one label — its table name for a scan, or the sorted table-set
  * signature `[a+b+...]` for a join subtree. Every bushy sub-branch is
  * additionally learned/recommended under its own path, so knowledge
  * about a sub-join transfers between plans that embed it differently.
  * Simplification vs the reference: min-cost aggregation instead of the
  * full cost-bound hierarchy.
  */
/** @param gamma reference-faithful cost integration when set
  *   (tonic.py:734 `cost + gamma * current`, default 0.8 there): new
  *   observations blend with the learned value via exponential decay,
  *   so a plan whose costs drift over time re-learns instead of being
  *   pinned to its historic minimum. None (default) keeps the simpler
  *   min-cost aggregation. */
final class QepSynopsis(val gamma: Option[Double] = None) {

  final class Node {
    val children: mutable.Map[String, Node] = mutable.Map.empty
    /** best (lowest) observed cost per operator at this prefix */
    val costs: mutable.Map[JoinOperator, Double] = mutable.Map.empty
  }

  val root = new Node

  /** Trie path: first table, then each joined table in join order. */
  private def nodeFor(prefix: Seq[String], create: Boolean): Option[Node] = {
    var node: Option[Node] = Some(root)
    prefix.foreach { t =>
      node = node.flatMap { n =>
        if (create) Some(n.children.getOrElseUpdate(t, new Node))
        else n.children.get(t)
      }
    }
    node
  }

  /** Best operator at the prefix. `minAlternatives = 2` reproduces the
    * reference's guard (tonic.py:713 argmin only when more than one
    * operator has been observed — a single data point is not evidence
    * that the others are worse); the default 1 recommends greedily. */
  def recommend(prefix: Seq[String],
      minAlternatives: Int = 1): Option[JoinOperator] =
    nodeFor(prefix, create = false)
      .filter(_.costs.size >= math.max(minAlternatives, 1))
      .map(_.costs.minBy { case (op, c) => (c, op.name) }._1)

  def recordCost(prefix: Seq[String], op: JoinOperator, cost: Double): Unit = {
    val n = nodeFor(prefix, create = true).get
    n.costs(op) = gamma match {
      case Some(g) => cost + g * n.costs.getOrElse(op, 0.0)
      case None => math.min(n.costs.getOrElse(op, Double.MaxValue), cost)
    }
  }

  def size: Int = {
    def count(n: Node): Int = 1 + n.children.values.map(count).sum
    count(root)
  }

  // ---- persistence (reference stores synopses as JSON artifacts) ----
  def toJson: String = {
    def render(n: Node): JValue = JObject(
      "costs" -> JObject(n.costs.toList.sortBy(_._1.name).map {
        case (op, c) => op.name -> JDouble(c) }),
      "children" -> JObject(n.children.toList.sortBy(_._1).map {
        case (t, c) => t -> render(c) }))
    JsonMethods.compact(JsonMethods.render(render(root)))
  }
}

object QepSynopsis {
  def fromJson(s: String): QepSynopsis = {
    val syn = new QepSynopsis
    def opOf(name: String) = JoinOperator.all.find(_.name == name).get
    def walk(v: JValue, node: syn.Node): Unit = v match {
      case JObject(fields) =>
        val m = fields.toMap
        m.get("costs").foreach {
          case JObject(cs) => cs.foreach {
            case (op, JDouble(c)) => node.costs(opOf(op)) = c
            case _ =>
          }
          case _ =>
        }
        m.get("children").foreach {
          case JObject(ch) => ch.foreach { case (t, cv) =>
            val child = new syn.Node
            node.children(t) = child
            walk(cv, child)
          }
          case _ =>
        }
      case _ =>
    }
    walk(JsonMethods.parse(s), syn.root)
    syn
  }
}

/** Canonical QEP-S path construction, shared by the TONIC stage and the
  * training-data harvester (graft.train) so persisted samples replay into
  * a trie under EXACTLY the paths live learning would have used.
  */
private[graft] object TriePaths {

  /** Canonical trie label of a branch: a scan is its table name, a join
    * subtree its sorted table-set signature. */
  def labelOf(t: JoinTree[Cardinality]): String = t match {
    case ScanNode(tr, _) => tr.identifier
    case j: JoinNode[Cardinality] =>
      j.tableSet.toSeq.sorted.mkString("[", "+", "]")
  }

  /** Canonical trie path: outer spine labels, one per joined-in branch.
    * For a left-deep tree this is exactly the table join order. */
  def pathOf(tree: JoinTree[Cardinality]): Seq[String] = tree match {
    case ScanNode(tr, _) => Seq(tr.identifier)
    case JoinNode(outer, inner, _) => pathOf(outer) :+ labelOf(inner)
  }

  /** All join nodes, pre-order (node, then outer subtree, then inner) —
    * the traversal order of physical joins in the compiled plan. */
  def joinsPreOrder(t: JoinTree[Cardinality]): Seq[JoinNode[Cardinality]] =
    t match {
      case _: ScanNode[Cardinality] => Seq.empty
      case j @ JoinNode(o, i, _) =>
        j +: (joinsPreOrder(o) ++ joinsPreOrder(i))
    }
}

/** Operator-selection stage backed by a QEP-S, with a fallback stage for
  * unseen prefixes, and online learning from executed plans (the
  * learn_from_feedback hook of the reference's stage taxonomy,
  * /root/reference/postbound/_stages.py:46-120).
  */
final class TonicOperatorSelection(val synopsis: QepSynopsis,
    fallback: PhysicalOperatorSelection = new UESOperatorSelection)
    extends PhysicalOperatorSelection with graft.pipeline.OnlineLearningStage {

  /** Online-learning entry point (reference `learn_from_feedback`,
    * _stages.py "Online Training"): an enforced plan feeds its measured
    * per-join rows into the trie under the enforced join order; a native
    * fallback plan is harvested via the plan-derived join tree instead. */
  def learnFromFeedback(result: graft.pipeline.OptimizationResult,
      executed: org.apache.spark.sql.DataFrame, execTimeMs: Double): Unit =
    result.joinOrder match {
      case Some(tree) if !result.usedNativeFallback =>
        learnFromExecution(tree, result.operators, executed)
      case _ => learnFromNativePlan(executed): Unit
    }

  def describe: String =
    s"""{"name":"tonic","synopsis_nodes":${synopsis.size},"fallback":${fallback.describe}}"""

  import TriePaths.{labelOf, pathOf, joinsPreOrder}

  def selectPhysicalOperators(q: QueryFacade, graph: JoinGraph,
      joinOrder: Option[JoinTree[Cardinality]]): PhysicalOperatorAssignment = {
    val base = fallback.selectPhysicalOperators(q, graph, joinOrder)
    joinOrder match {
      case Some(tree) =>
        joinsPreOrder(tree).foldLeft(base) { (asg, j) =>
          synopsis.recommend(pathOf(j))
            .map(op => asg.withJoin(j.tableSet, op)).getOrElse(asg)
        }
      case None => base
    }
  }

  /** Feed measured per-join costs of an executed plan back into the trie.
    * Physical joins are collected pre-order from the executed plan, which
    * matches the tree's pre-order join traversal (the enforcer compiles
    * `outer` as the left child), so bushy branches pair up too. */
  def learnFromExecution(tree: JoinTree[Cardinality],
      ops: PhysicalOperatorAssignment, df: org.apache.spark.sql.DataFrame): Unit = {
    val joinRows = QueryPlanOps(df).actualJoinRows
    joinsPreOrder(tree).zip(joinRows).foreach { case (j, rows) =>
      if (rows >= 0) {
        val op = ops.operatorFor(j.tableSet).getOrElse(JoinOperator.HashJoin)
        synopsis.recordCost(pathOf(j), op, rows.toDouble)
      }
    }
  }

  /** Learn from a plan Spark chose NATIVELY (no enforced tree): the join
    * tree and the operators both come from the executed physical plan via
    * [[QueryPlanOps.joinTree]] — the reference's workflow of seeding the
    * QEP-S from an observed workload before TONIC starts steering. */
  def learnFromNativePlan(df: org.apache.spark.sql.DataFrame): Boolean = {
    val opsSeen = QueryPlanOps(df).joinOperators.map {
      case n if n.contains("BroadcastHashJoin") => JoinOperator.BroadcastHashJoin
      case n if n.contains("ShuffledHashJoin") => JoinOperator.HashJoin
      case n if n.contains("SortMergeJoin") => JoinOperator.SortMergeJoin
      case _ => JoinOperator.NestedLoopJoin
    }
    QueryPlanOps(df).joinTree match {
      case Some(tree) =>
        joinsPreOrder(tree).zip(opsSeen).foreach { case (j, op) =>
          if (j.annotation.isValid)
            synopsis.recordCost(pathOf(j), op, j.annotation.value)
        }
        true
      case None => false
    }
  }
}
