package graft.vis

import scala.collection.mutable

import graft.bench.ExecutionResult
import graft.core.Cardinality
import graft.opt.{JoinGraph, QepSynopsis}
import graft.pipeline.OptimizationResult
import graft.plans.{JoinNode, JoinTree, ScanNode}

/** Self-contained graph layout and plotting — the analog of the
  * reference's vis module beyond tree rendering
  * (/root/reference/postbound/vis/graphs.py renders join graphs through
  * graphviz layouts; vis/plots.py builds per-label grid plots over a
  * results frame). Spark-side there is no graphviz/matplotlib, so the
  * layout IS part of the library: a deterministic Fruchterman-Reingold
  * force-directed layout plus SVG emitters, with no dependencies beyond
  * the JDK. Everything is driver-side over metadata (tables, edges,
  * per-query results) — never over data.
  */
object Vis {

  /** Deterministic xorshift PRNG — layouts must be reproducible across
    * runs for diffable artifacts (no java.util.Random default seeding).
    */
  private final class Rng(seed0: Long) {
    private var s: Long = if (seed0 == 0L) 0x9E3779B97F4A7C15L else seed0
    def nextDouble(): Double = {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      ((s >>> 11).toDouble / (1L << 53).toDouble)
    }
  }

  /** Fruchterman-Reingold force-directed layout: repulsion k²/d between
    * every node pair, attraction d²/k along edges, linearly cooling
    * displacement cap. O(n² · iters) driver-side — node sets here are
    * query join graphs (tens of tables), never data-sized.
    * Returns node -> (x, y) in [0,1]².
    */
  def forceDirectedLayout(nodes: Seq[String], edges: Seq[(String, String)],
      iterations: Int = 150, seed: Long = 42L): Map[String, (Double, Double)] = {
    require(nodes.nonEmpty, "no nodes to lay out")
    val rng = new Rng(seed)
    val n = nodes.size
    val idx = nodes.zipWithIndex.toMap
    val es = edges.collect {
      case (a, b) if idx.contains(a) && idx.contains(b) && a != b =>
        (idx(a), idx(b))
    }
    val x = Array.fill(n)(rng.nextDouble())
    val y = Array.fill(n)(rng.nextDouble())
    val k = math.sqrt(1.0 / n) // ideal pairwise distance in the unit square
    var temp = 0.1
    val cool = temp / (iterations + 1)
    (0 until iterations).foreach { _ =>
      val dx = new Array[Double](n)
      val dy = new Array[Double](n)
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          val ddx = x(i) - x(j); val ddy = y(i) - y(j)
          val d = math.max(1e-6, math.sqrt(ddx * ddx + ddy * ddy))
          val rep = k * k / d / d // force/d: multiply by raw deltas below
          dx(i) += ddx * rep; dy(i) += ddy * rep
          dx(j) -= ddx * rep; dy(j) -= ddy * rep
          j += 1
        }
        i += 1
      }
      es.foreach { case (a, b) =>
        val ddx = x(a) - x(b); val ddy = y(a) - y(b)
        val d = math.max(1e-6, math.sqrt(ddx * ddx + ddy * ddy))
        val att = d / k // (d²/k)/d
        dx(a) -= ddx * att; dy(a) -= ddy * att
        dx(b) += ddx * att; dy(b) += ddy * att
      }
      i = 0
      while (i < n) {
        val disp = math.max(1e-9, math.sqrt(dx(i) * dx(i) + dy(i) * dy(i)))
        val step = math.min(disp, temp)
        x(i) = math.min(1.0, math.max(0.0, x(i) + dx(i) / disp * step))
        y(i) = math.min(1.0, math.max(0.0, y(i) + dy(i) / disp * step))
        i += 1
      }
      temp -= cool
    }
    nodes.map(t => t -> (x(idx(t)), y(idx(t)))).toMap
  }

  private def escXml(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    .replace("\"", "&quot;")

  /** A join graph as a standalone SVG: FDL node positions, undirected
    * edges (FK edges get an arrowhead toward the PK side, matching
    * [[graft.plans.PlanViz.dotJoinGraph]]'s orientation), table-name
    * labels. Deterministic per (graph, seed).
    */
  def svgJoinGraph(graph: JoinGraph, width: Int = 640, height: Int = 480,
      seed: Long = 42L): String = {
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" height="$height" viewBox="0 0 $width $height">\n"""
    sb ++= """  <defs><marker id="fk" markerWidth="8" markerHeight="8" refX="14" refY="3" orient="auto"><path d="M0,0 L6,3 L0,6 z"/></marker></defs>""" + "\n"
    appendJoinGraph(sb, graph, 0.0, 0.0, width, height, seed)
    sb ++= "</svg>\n"
    sb.toString
  }

  /** Join-graph content only (no svg envelope), drawn at an offset —
    * shared by [[svgJoinGraph]] and the stage panels of
    * [[svgOptimizerStages]]. The marker `#fk` must be defined by the
    * caller's envelope. */
  private def appendJoinGraph(sb: StringBuilder, graph: JoinGraph,
      ox: Double, oy: Double, width: Int, height: Int, seed: Long): Unit = {
    val nodes = graph.tables
    val edgePairs = graph.edges.toSeq.collect {
      case e if e.tables.size == 2 =>
        val ts = e.tables.toSeq.sorted
        (ts.head, ts(1), graph.pkSideOf(e))
    }
    val pos0 = forceDirectedLayout(nodes,
      edgePairs.map(e => (e._1, e._2)), seed = seed)
    // 8% margin so labels at the hull stay inside the canvas
    def px(p: (Double, Double)) =
      (ox + width * (0.08 + 0.84 * p._1), oy + height * (0.08 + 0.84 * p._2))
    val pos = pos0.map { case (t, p) => t -> px(p) }
    edgePairs.foreach { case (a, b, pkSide) =>
      val (x1, y1) = pos(a); val (x2, y2) = pos(b)
      // orient the marker end at the PK side (FK -> PK), none otherwise
      val (sx, sy, ex, ey) = pkSide match {
        case Some(pk) if pk == a => (x2, y2, x1, y1)
        case _ => (x1, y1, x2, y2)
      }
      val marker = if (pkSide.isDefined) """ marker-end="url(#fk)"""" else ""
      sb ++= f"""  <line x1="$sx%.1f" y1="$sy%.1f" x2="$ex%.1f" y2="$ey%.1f" stroke="#888" stroke-width="1.5"$marker/>%n"""
    }
    nodes.foreach { t =>
      val (cx, cy) = pos(t)
      sb ++= f"""  <circle cx="$cx%.1f" cy="$cy%.1f" r="10" fill="#dde6f0" stroke="#456"/>%n"""
      sb ++= f"""  <text x="$cx%.1f" y="${cy - 14}%.1f" text-anchor="middle" font-size="12" font-family="sans-serif">${escXml(t)}</text>%n"""
    }
  }

  /** Grid of per-label mini bar charts over harness results — the
    * analog of the reference's `make_grid_plot` (vis/plots.py:15: one
    * subplot per workload label, caller-supplied plotter; here each cell
    * plots exec_time per repetition, the shape the reference grids most).
    * Failed repetitions (negative time) render as hollow bars at full
    * height so gaps are visible, not dropped.
    */
  def svgResultGrid(results: Seq[ExecutionResult], ncols: Int = 4,
      cellW: Int = 160, cellH: Int = 100): String = {
    require(results.nonEmpty, "no results to plot")
    val byLabel = results.groupBy(_.label).toSeq.sortBy(_._1)
    val nrows = (byLabel.size + ncols - 1) / ncols
    val width = ncols * cellW
    val height = nrows * cellH
    val tMax = math.max(1e-9, results.map(_.exec_time).filter(_ >= 0)
      .foldLeft(0.0)(math.max))
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" height="$height" viewBox="0 0 $width $height">\n"""
    byLabel.zipWithIndex.foreach { case ((label, rs), i) =>
      val ox = (i % ncols) * cellW
      val oy = (i / ncols) * cellH
      val plotH = cellH - 34 // title + time axis label
      sb ++= f"""  <text x="${ox + cellW / 2}" y="${oy + 14}" text-anchor="middle" font-size="11" font-family="sans-serif">${escXml(label)}</text>%n"""
      val ordered = rs.sortBy(r => (r.workload_repetition, r.query_repetition))
      val barW = math.max(2.0, (cellW - 20.0) / ordered.size - 2.0)
      ordered.zipWithIndex.foreach { case (r, j) =>
        val bx = ox + 10 + j * (barW + 2)
        if (r.exec_time >= 0) {
          val h = math.max(1.0, plotH * (r.exec_time / tMax))
          sb ++= f"""  <rect x="$bx%.1f" y="${oy + 20 + plotH - h}%.1f" width="$barW%.1f" height="$h%.1f" fill="#6b8cba"/>%n"""
        } else {
          sb ++= f"""  <rect x="$bx%.1f" y="${oy + 20}" width="$barW%.1f" height="$plotH" fill="none" stroke="#c66" stroke-dasharray="3,2"/>%n"""
        }
      }
      sb ++= f"""  <text x="${ox + cellW / 2}" y="${oy + cellH - 4}" text-anchor="middle" font-size="9" font-family="sans-serif" fill="#666">max ${tMax}%.2fs</text>%n"""
    }
    sb ++= "</svg>\n"
    sb.toString
  }

  // ------------------------------------------------------ TONIC QEP-S trie

  /** The learned TONIC QEP-S trie as a standalone SVG — the analog of the
    * reference's plot_tonic_qeps (/root/reference/postbound/vis/tonic.py:41;
    * graphviz there, a tidy layered tree layout here). One box per trie
    * prefix labeled with the table joined at that step plus the learned
    * per-operator costs (tonic.py's `[op=cost, ...]` label, :27-38); the
    * root is the empty prefix "∅". Deterministic: children render in
    * sorted-key order — the reference salts its node ids with random()
    * (tonic.py:12), which is exactly what a diffable artifact must not do.
    */
  def svgTonicTrie(syn: QepSynopsis, nodeW: Int = 132, nodeH: Int = 40,
      hGap: Int = 14, vGap: Int = 34): String = {
    final case class Laid(label: String, costs: Seq[String], x: Double,
      depth: Int, parent: Int)
    val laid = mutable.ArrayBuffer.empty[Laid]
    var nextLeaf = 0.0
    def walk(node: syn.Node, label: String, depth: Int, parent: Int): Double = {
      val id = laid.length
      laid += null // reserve the slot so children can point at it
      val kids = node.children.toSeq.sortBy(_._1)
      val x =
        if (kids.isEmpty) { val v = nextLeaf; nextLeaf += 1.0; v }
        else {
          val xs = kids.map { case (t, c) => walk(c, t, depth + 1, id) }
          (xs.min + xs.max) / 2.0
        }
      val costs = node.costs.toSeq.sortBy(_._1.name).map {
        case (op, c) => f"${op.name}%s=${c}%.1f"
      }
      laid(id) = Laid(label, costs, x, depth, parent)
      x
    }
    walk(syn.root, "∅", 0, -1)
    val maxDepth = laid.map(_.depth).max
    val leaves = math.max(1.0, nextLeaf)
    val width = (leaves * (nodeW + hGap) + hGap).toInt
    val height = (maxDepth + 1) * (nodeH + vGap) + vGap
    def cx(l: Laid) = hGap + l.x * (nodeW + hGap) + nodeW / 2.0
    def cy(l: Laid) = vGap + l.depth * (nodeH + vGap) + nodeH / 2.0
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" height="$height" viewBox="0 0 $width $height">\n"""
    laid.foreach { l =>
      if (l.parent >= 0) {
        val p = laid(l.parent)
        sb ++= f"""  <line x1="${cx(p)}%.1f" y1="${cy(p) + nodeH / 2.0}%.1f" x2="${cx(l)}%.1f" y2="${cy(l) - nodeH / 2.0}%.1f" stroke="#888"/>%n"""
      }
    }
    laid.foreach { l =>
      val x0 = cx(l) - nodeW / 2.0; val y0 = cy(l) - nodeH / 2.0
      val dashed = if (l.parent < 0) """ stroke-dasharray="3,2"""" else ""
      sb ++= f"""  <rect x="$x0%.1f" y="$y0%.1f" width="$nodeW" height="$nodeH" rx="4" fill="#f4f7fa" stroke="#456"$dashed/>%n"""
      sb ++= f"""  <text x="${cx(l)}%.1f" y="${y0 + 15}%.1f" text-anchor="middle" font-size="11" font-family="sans-serif">${escXml(l.label)}</text>%n"""
      if (l.costs.nonEmpty)
        sb ++= f"""  <text x="${cx(l)}%.1f" y="${y0 + 30}%.1f" text-anchor="middle" font-size="8" font-family="sans-serif" fill="#666">${escXml(l.costs.mkString("[", ", ", "]"))}</text>%n"""
    }
    sb ++= "</svg>\n"
    sb.toString
  }

  // -------------------------------------------------- optimizer stage view

  private def tablesOf(t: JoinTree[Cardinality]): Set[String] = t match {
    case ScanNode(tbl, _) => Set(tbl.identifier)
    case JoinNode(o, i, _) => tablesOf(o) ++ tablesOf(i)
  }

  /** One join tree as boxes at an offset; join-node labels come from the
    * caller (logical: cardinality; physical: operator + hinted card). */
  private def appendJoinTree(sb: StringBuilder, tree: JoinTree[Cardinality],
      ox: Double, oy: Double, nodeW: Int, nodeH: Int, hGap: Int, vGap: Int,
      labelOf: JoinTree[Cardinality] => Seq[String]): Unit = {
    final case class Laid(lines: Seq[String], x: Double, depth: Int,
      parent: Int)
    val laid = mutable.ArrayBuffer.empty[Laid]
    var nextLeaf = 0.0
    def walk(t: JoinTree[Cardinality], depth: Int, parent: Int): Double = {
      val id = laid.length
      laid += null
      val x = t match {
        case _: ScanNode[_] => val v = nextLeaf; nextLeaf += 1.0; v
        case JoinNode(o, i, _) =>
          val xs = Seq(walk(o, depth + 1, id), walk(i, depth + 1, id))
          (xs.min + xs.max) / 2.0
      }
      laid(id) = Laid(labelOf(t), x, depth, parent)
      x
    }
    walk(tree, 0, -1)
    def cx(l: Laid) = ox + hGap + l.x * (nodeW + hGap) + nodeW / 2.0
    def cy(l: Laid) = oy + vGap + l.depth * (nodeH + vGap) + nodeH / 2.0
    laid.foreach { l =>
      if (l.parent >= 0) {
        val p = laid(l.parent)
        sb ++= f"""  <line x1="${cx(p)}%.1f" y1="${cy(p) + nodeH / 2.0}%.1f" x2="${cx(l)}%.1f" y2="${cy(l) - nodeH / 2.0}%.1f" stroke="#888"/>%n"""
      }
    }
    laid.foreach { l =>
      val x0 = cx(l) - nodeW / 2.0; val y0 = cy(l) - nodeH / 2.0
      sb ++= f"""  <rect x="$x0%.1f" y="$y0%.1f" width="$nodeW" height="$nodeH" rx="4" fill="#eef2ee" stroke="#465"/>%n"""
      l.lines.zipWithIndex.foreach { case (line, i) =>
        sb ++= f"""  <text x="${cx(l)}%.1f" y="${y0 + 13 + i * 12}%.1f" text-anchor="middle" font-size="${if (i == 0) 11 else 8}" font-family="sans-serif"${if (i == 0) "" else """ fill="#666""""}>${escXml(line)}</text>%n"""
      }
    }
  }

  /** The multi-stage optimizer pipeline as one SVG, one panel per stage —
    * the view the reference composes from plot_join_graph /
    * plot_join_tree / plot_query_plan per stage
    * (/root/reference/postbound/vis/optimizer.py:131,41,384): the input
    * join graph, the chosen join order with estimated cardinalities, and
    * the physical assignment (operator per join, hinted cardinality).
    * Purely driver-side over optimizer metadata; never touches data.
    */
  def svgOptimizerStages(graph: JoinGraph, result: OptimizationResult,
      panelW: Int = 420, panelH: Int = 360, seed: Long = 42L): String = {
    val width = 3 * panelW
    val height = panelH + 24
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" height="$height" viewBox="0 0 $width $height">\n"""
    sb ++= """  <defs><marker id="fk" markerWidth="8" markerHeight="8" refX="14" refY="3" orient="auto"><path d="M0,0 L6,3 L0,6 z"/></marker></defs>""" + "\n"
    val titles = Seq("1 · join graph", "2 · join order",
      "3 · physical operators")
    titles.zipWithIndex.foreach { case (t, i) =>
      sb ++= f"""  <text x="${i * panelW + panelW / 2}" y="16" text-anchor="middle" font-size="13" font-family="sans-serif" font-weight="bold">${escXml(t)}</text>%n"""
      if (i > 0)
        sb ++= f"""  <line x1="${i * panelW}" y1="0" x2="${i * panelW}" y2="$height" stroke="#ccc"/>%n"""
    }
    appendJoinGraph(sb, graph, 0.0, 24.0, panelW, panelH, seed)
    result.joinOrder match {
      case None =>
        sb ++= f"""  <text x="${panelW + panelW / 2}" y="${24 + panelH / 2}" text-anchor="middle" font-size="12" font-family="sans-serif" fill="#a44">native fallback — no join order chosen</text>%n"""
      case Some(tree) =>
        def fmt(c: Cardinality) = if (c.isUnknown) "card=?"
          else s"card=${c.value.round}"
        appendJoinTree(sb, tree, panelW.toDouble, 24.0, 96, 34, 8, 26, {
          case ScanNode(tbl, c) => Seq(tbl.identifier, fmt(c))
          case JoinNode(_, _, c) => Seq("⋈", fmt(c))
        })
        appendJoinTree(sb, tree, 2.0 * panelW, 24.0, 96, 34, 8, 26, {
          case ScanNode(tbl, _) =>
            Seq(tbl.identifier,
              result.operators.scanOperators.get(tbl.identifier)
                .map(_.name).getOrElse("scan"))
          case j @ JoinNode(_, _, _) =>
            val ts = tablesOf(j)
            val op = result.operators.operatorFor(ts)
              .map(_.name).getOrElse("⋈")
            val hint = result.parameters.cardinalityHints.get(ts)
              .map(c => s"hint=${c.value.round}").toSeq
            op +: hint
        })
    }
    sb ++= "</svg>\n"
    sb.toString
  }
}
