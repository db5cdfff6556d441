package graft.vis

import graft.bench.ExecutionResult
import graft.opt.JoinGraph

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
      (width * (0.08 + 0.84 * p._1), height * (0.08 + 0.84 * p._2))
    val pos = pos0.map { case (t, p) => t -> px(p) }
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" height="$height" viewBox="0 0 $width $height">\n"""
    sb ++= """  <defs><marker id="fk" markerWidth="8" markerHeight="8" refX="14" refY="3" orient="auto"><path d="M0,0 L6,3 L0,6 z"/></marker></defs>""" + "\n"
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
    sb ++= "</svg>\n"
    sb.toString
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
}
