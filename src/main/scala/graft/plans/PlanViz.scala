package graft.plans

import graft.core.Cardinality
import graft.opt.{JoinGraph, QepSynopsis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Dependency-free plan/graph rendering — the Spark-native analog of the
  * reference's `vis` package (plot_join_tree /root/reference/postbound/vis/
  * optimizer.py:41, plot_join_graph :131, plot_query_plan :384, TONIC trie
  * vis/tonic.py). The reference emits graphviz objects for notebooks; a
  * cluster-side library cannot assume a graphviz binary or a display, so
  * every renderer returns plain text: DOT source (feed to `dot -Tsvg`
  * anywhere) or an indented ASCII tree (feed to a log line). Rendering
  * never executes the plan — actuals appear only if the caller executed it
  * first (same contract as the reference's explain-analyze annotators,
  * vis/optimizer.py:420).
  */
object PlanViz {

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def fmtCard(c: Cardinality): String =
    if (c.isUnknown) "?" else f"${c.value}%.0f"

  // ------------------------------------------------------------ join trees

  /** DOT source for a [[JoinTree]], cardinality annotations on each node. */
  def dotJoinTree(tree: JoinTree[Cardinality]): String = {
    val sb = new StringBuilder("graph JoinTree {\n  node [shape=box];\n")
    var n = 0
    def walk(t: JoinTree[Cardinality]): Int = {
      val id = { n += 1; n }
      t match {
        case ScanNode(tbl, c) =>
          sb ++= s"""  n$id [label="${esc(tbl.identifier)}\\ncard=${fmtCard(c)}"];\n"""
        case JoinNode(o, i, c) =>
          sb ++= s"""  n$id [label="⋈\\ncard=${fmtCard(c)}"];\n"""
          val (lo, li) = (walk(o), walk(i))
          sb ++= s"  n$id -- n$lo;\n  n$id -- n$li;\n"
      }
      id
    }
    walk(tree)
    sb ++= "}\n"
    sb.toString
  }

  /** Indented ASCII join tree (one node per line, children indented). */
  def asciiJoinTree(tree: JoinTree[Cardinality]): String = {
    val sb = new StringBuilder
    def walk(t: JoinTree[Cardinality], depth: Int): Unit = {
      val pad = "  " * depth
      t match {
        case ScanNode(tbl, c) =>
          sb ++= s"$pad${tbl.identifier} [card=${fmtCard(c)}]\n"
        case JoinNode(o, i, c) =>
          sb ++= s"${pad}JOIN [card=${fmtCard(c)}]\n"
          walk(o, depth + 1); walk(i, depth + 1)
      }
    }
    walk(tree, 0)
    sb.toString
  }

  // ------------------------------------------------------------ join graph

  /** DOT source for a [[JoinGraph]]: tables as nodes, join predicates as
    * edge labels; pk-fk edges rendered as directed arrows INTO the pk side
    * (the reference's arrowhead convention, vis/optimizer.py:54-80).
    */
  def dotJoinGraph(graph: JoinGraph): String = {
    val sb = new StringBuilder("digraph JoinGraph {\n  node [shape=ellipse];\n")
    graph.tables.foreach(t => sb ++= s"""  "${esc(t)}";\n""")
    graph.edges.foreach { e =>
      val label = esc(e.expr.sql)
      val ts = e.tables.toSeq.sorted
      if (ts.size == 2) {
        val arrow = graph.pkSideOf(e) match {
          case Some(pk) =>
            val fk = (e.tables - pk).head
            s""""${esc(fk)}" -> "${esc(pk)}" [label="$label"]"""
          case None =>
            s""""${esc(ts.head)}" -> "${esc(ts(1))}" [label="$label", dir=none]"""
        }
        sb ++= s"  $arrow;\n"
      }
    }
    sb ++= "}\n"
    sb.toString
  }

  // ----------------------------------------------------------- query plans

  /** DOT source for an executed (or merely planned) physical plan:
    * operator name per node, SQLMetric actual row counts where the plan
    * has run (`numOutputRows`), '?' otherwise — the estimates-vs-actuals
    * view the reference's annotate_cards builds (vis/optimizer.py:241).
    */
  def dotPhysicalPlan(df: DataFrame): String = {
    val plan = QueryPlanOps(df).physicalPlan
    val sb = new StringBuilder("digraph PhysicalPlan {\n  node [shape=box];\n")
    var n = 0
    def walk(p: SparkPlan): Int = {
      val id = { n += 1; n }
      val actual = p.metrics.get("numOutputRows")
        .map(m => if (m.value >= 0) m.value.toString else "?").getOrElse("?")
      sb ++= s"""  n$id [label="${esc(p.nodeName)}\\nrows=$actual"];\n"""
      p.children.foreach(c => sb ++= s"  n$id -> n${walk(c)};\n")
      id
    }
    walk(plan)
    sb ++= "}\n"
    sb.toString
  }

  // ------------------------------------------------------------ TONIC trie

  /** ASCII rendering of a TONIC QEP-S trie: one line per node with the
    * per-operator cost table (vis/tonic.py analog). */
  def asciiTonic(syn: QepSynopsis): String = {
    val sb = new StringBuilder("QEP-S\n")
    def walk(node: syn.Node, depth: Int): Unit = {
      node.children.toSeq.sortBy(_._1).foreach { case (label, child) =>
        val costs = child.costs.toSeq.sortBy(_._1.name)
          .map { case (op, c) => f"${op.name}=$c%.1f" }.mkString(", ")
        sb ++= s"${"  " * depth}$label${if (costs.nonEmpty) s" {$costs}" else ""}\n"
        walk(child, depth + 1)
      }
    }
    walk(syn.root, 1)
    sb.toString
  }
}
