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
  * Simplification vs the reference: left-deep prefixes only (the reference
  * canonicalizes bushy plans too) and min-cost aggregation instead of the
  * full cost-bound hierarchy.
  */
final class QepSynopsis {

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

  def recommend(prefix: Seq[String]): Option[JoinOperator] =
    nodeFor(prefix, create = false)
      .filter(_.costs.nonEmpty)
      .map(_.costs.minBy { case (op, c) => (c, op.name) }._1)

  def recordCost(prefix: Seq[String], op: JoinOperator, cost: Double): Unit = {
    val n = nodeFor(prefix, create = true).get
    n.costs(op) = math.min(n.costs.getOrElse(op, Double.MaxValue), cost)
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

/** Operator-selection stage backed by a QEP-S, with a fallback stage for
  * unseen prefixes, and online learning from executed plans (the
  * learn_from_feedback hook of the reference's stage taxonomy,
  * /root/reference/postbound/_stages.py:46-120).
  */
final class TonicOperatorSelection(val synopsis: QepSynopsis,
    fallback: PhysicalOperatorSelection = new UESOperatorSelection)
    extends PhysicalOperatorSelection {

  def describe: String =
    s"""{"name":"tonic","synopsis_nodes":${synopsis.size},"fallback":${fallback.describe}}"""

  /** Left-deep prefix (join order) of a tree, if it is left-deep. */
  private def orderOf(tree: JoinTree[Cardinality]): Option[Seq[String]] =
    if (tree.isLeftDeep) Some(tree.tables.map(_.identifier)) else None

  def selectPhysicalOperators(q: QueryFacade, graph: JoinGraph,
      joinOrder: Option[JoinTree[Cardinality]]): PhysicalOperatorAssignment = {
    val base = fallback.selectPhysicalOperators(q, graph, joinOrder)
    (joinOrder, joinOrder.flatMap(orderOf)) match {
      case (Some(tree), Some(order)) =>
        var assignment = base
        var prefix = Seq(order.head)
        order.tail.foreach { t =>
          prefix :+= t
          synopsis.recommend(prefix).foreach { op =>
            assignment = assignment.withJoin(prefix.toSet, op)
          }
        }
        assignment
      case _ => base
    }
  }

  /** Feed measured per-join costs of an executed plan back into the trie.
    * Join metrics are collected top-down; for a left-deep tree the k-th
    * join bottom-up corresponds to prefix order[0..k+1]. */
  def learnFromExecution(tree: JoinTree[Cardinality],
      ops: PhysicalOperatorAssignment, df: org.apache.spark.sql.DataFrame): Unit =
    orderOf(tree).foreach { order =>
      val joinRows = QueryPlanOps(df).actualJoinRows.reverse // bottom-up
      val prefixes = (2 to order.size).map(k => order.take(k))
      prefixes.zip(joinRows).foreach { case (prefix, rows) =>
        if (rows >= 0) {
          val op = ops.operatorFor(prefix.toSet)
            .getOrElse(JoinOperator.HashJoin)
          synopsis.recordCost(prefix, op, rows.toDouble)
        }
      }
    }
}
