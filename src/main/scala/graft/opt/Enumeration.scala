package graft.opt

import graft.core.Cardinality
import graft.pipeline.{CardinalityEstimator, CostModel, JoinOrderOptimization,
  PlanEnumerator}
import graft.plans.{JoinNode, JoinTree, ScanNode}
import graft.qal.QueryFacade

/** System-R style cardinality estimation over the join graph: independent
  * filters, equi-join selectivity 1/max(ndv_a, ndv_b) per connecting edge.
  * (The textbook model the reference's DynamicProgrammingEnumerator assumes,
  * /root/reference/postbound/opt/dynprog.py:79.)
  */
final class BasicCardinalityEstimator extends CardinalityEstimator {
  def describe: String = """{"name":"basic-card","model":"system-r"}"""

  def calculateEstimate(graph: JoinGraph, tables: Set[String]): Cardinality = {
    val stats = graph.stats
    def leaf(t: String) = graph.block.leafPlan(t)
    val baseProduct = tables.toSeq.map(t =>
      stats.rowCount(leaf(t),
        QueryFacade.andAll(graph.block.filtersFor(t))).toDouble.max(1.0)).product
    val selectivity = graph.edges
      .filter(_.tables.subsetOf(tables))
      .flatMap(_.equiColumns)
      .map { case (ca, cb) =>
        val da = stats.distinctCount(leaf(ca.table.get.identifier), ca.name)
        val db = stats.distinctCount(leaf(cb.table.get.identifier), cb.name)
        1.0 / math.max(1L, math.max(da, db)).toDouble
      }.product
    Cardinality(math.max(baseProduct * selectivity, 1.0))
  }
}

/** Statistics-only cardinality estimation: filter selectivities from
  * histograms / MCVs / ndv instead of exact filtered-count probes. The
  * exact-probe path ([[BasicCardinalityEstimator]]) mirrors the
  * reference's emulated statistics but costs one COUNT job per (table,
  * filter) — at 100 TB that is a full scan per probe. This estimator
  * touches the data once per table (base stats, cached) and estimates
  * everything else from the reference's own statistic types
  * (Histogram/MostCommonValues, /root/reference/postbound/db/_db.py:
  * 1600-1963), trading per-query accuracy for probe-free optimization.
  * Unestimatable predicates fall back to the classic 1/3 selectivity.
  */
final class StatisticalCardinalityEstimator extends CardinalityEstimator {
  import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo,
    Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual,
    Literal}

  def describe: String = """{"name":"statistical-card","model":"histogram-mcv"}"""

  private def numeric(l: Literal): Option[Double] = l.dataType match {
    // timestamp literals carry epoch MICROS; histograms are built over
    // CAST(ts AS DOUBLE) = epoch seconds — align the scales
    case org.apache.spark.sql.types.TimestampType =>
      Option(l.value).map(_.asInstanceOf[Long] / 1e6)
    // date histograms are not buildable (ANSI forbids date->double cast)
    case org.apache.spark.sql.types.DateType => None
    case _ => l.value match {
      case null => None
      case n: Number => Some(n.doubleValue())
      case _ => scala.util.Try(l.value.toString.toDouble).toOption
    }
  }

  /** Fraction of an equi-width histogram at or below `v` (linear
    * interpolation within the containing bucket). */
  private def fractionBelow(h: graft.stats.Histogram, v: Double): Double = {
    if (h.total <= 0 || h.hi <= h.lo) return 0.5
    if (v <= h.lo) return 0.0
    if (v >= h.hi) return 1.0
    val width = (h.hi - h.lo) / h.buckets
    val idx = math.min(((v - h.lo) / width).toInt, h.buckets - 1)
    val below = h.counts.take(idx).sum.toDouble
    val within = h.counts(idx) * ((v - (h.lo + idx * width)) / width)
    (below + within) / h.total
  }

  private def selectivity(graph: JoinGraph, table: String,
      pred: Expression): Double = {
    val stats = graph.stats
    val leaf = graph.block.leafPlan(table)
    val rows = math.max(stats.rowCount(leaf), 1L).toDouble
    pred match {
      case EqualTo(a: Attribute, l: Literal) =>
        // MCV entries hold external values; literals carry internal ones
        val key = l.value match {
          case u: org.apache.spark.unsafe.types.UTF8String => u.toString
          case v => v
        }
        val mcv = stats.mostCommonValues(leaf, a.name)
        mcv.frequencyOf(key).map(_ / rows).getOrElse(
          1.0 / math.max(stats.distinctCount(leaf, a.name), 1L))
      case EqualTo(l: Literal, a: Attribute) =>
        selectivity(graph, table, EqualTo(a, l))
      case LessThan(a: Attribute, l: Literal) => rangeBelow(graph, table, a, l)
      case LessThanOrEqual(a: Attribute, l: Literal) => rangeBelow(graph, table, a, l)
      case GreaterThan(a: Attribute, l: Literal) =>
        1.0 - rangeBelow(graph, table, a, l)
      case GreaterThanOrEqual(a: Attribute, l: Literal) =>
        1.0 - rangeBelow(graph, table, a, l)
      case GreaterThan(l: Literal, a: Attribute) => rangeBelow(graph, table, a, l)
      case LessThan(l: Literal, a: Attribute) =>
        1.0 - rangeBelow(graph, table, a, l)
      case _ => 1.0 / 3.0
    }
  }

  private def rangeBelow(graph: JoinGraph, table: String, a: Attribute,
      l: Literal): Double =
    numeric(l).map { v =>
      fractionBelow(graph.stats.histogram(graph.block.leafPlan(table), a.name), v)
    }.getOrElse(1.0 / 3.0)

  def calculateEstimate(graph: JoinGraph, tables: Set[String]): Cardinality = {
    val stats = graph.stats
    def leaf(t: String) = graph.block.leafPlan(t)
    val baseProduct = tables.toSeq.map { t =>
      val base = math.max(stats.rowCount(leaf(t)), 1L).toDouble
      val sel = graph.block.filtersFor(t)
        .map(p => selectivity(graph, t, p)).product
      math.max(base * sel, 1.0)
    }.product
    val joinSel = graph.edges
      .filter(_.tables.subsetOf(tables))
      .flatMap(_.equiColumns)
      .map { case (ca, cb) =>
        val da = stats.distinctCount(leaf(ca.table.get.identifier), ca.name)
        val db = stats.distinctCount(leaf(cb.table.get.identifier), cb.name)
        1.0 / math.max(1L, math.max(da, db)).toDouble
      }.product
    Cardinality(math.max(baseProduct * joinSel, 1.0))
  }
}

/** C_out cost: sum of the cardinalities of all intermediate results
  * (reference: QueryPlan.cout, /root/reference/postbound/_qep.py:1550). */
final class CoutCostModel extends CostModel {
  def describe: String = """{"name":"cout"}"""
  def estimateCost(graph: JoinGraph, plan: JoinTree[Cardinality]): Double =
    plan match {
      case s: ScanNode[Cardinality] => 0.0
      case j @ JoinNode(o, i, a) =>
        a.value + estimateCost(graph, o) + estimateCost(graph, i)
    }
}

/** Textbook dynamic programming over connected subsets (DPsize flavor):
  * bushy trees, cross products avoided while the graph is connected.
  * Port of DynamicProgrammingEnumerator
  * (/root/reference/postbound/opt/dynprog.py:79-360).
  */
final class DynamicProgrammingEnumerator(linearOnly: Boolean = false)
    extends PlanEnumerator {
  def describe: String =
    s"""{"name":"dynprog","shape":"${if (linearOnly) "left-deep" else "bushy"}"}"""

  def generateExecutionPlan(q: QueryFacade, graph: JoinGraph,
      cost: CostModel, card: CardinalityEstimator): JoinTree[Cardinality] = {
    val tables = graph.tables.toVector
    def ref(t: String) = graph.block.tables.find(_.identifier == t).get
    def connected(a: Set[String], b: Set[String]): Boolean =
      graph.edges.exists(e => e.tables.exists(a.contains) &&
        e.tables.exists(b.contains) && e.tables.subsetOf(a ++ b))

    val best = scala.collection.mutable.Map.empty[Set[String],
      (JoinTree[Cardinality], Double)]
    tables.foreach { t =>
      val c = card.calculateEstimate(graph, Set(t))
      best(Set(t)) = (ScanNode(ref(t), c), 0.0)
    }
    for (size <- 2 to tables.size) {
      tables.combinations(size).foreach { comboSeq =>
        val combo = comboSeq.toSet
        var bestPlan: Option[(JoinTree[Cardinality], Double)] = None
        val partitions: Iterator[Set[String]] =
          if (linearOnly) combo.iterator.map(t => combo - t)
          else combo.subsets().filter(s => s.nonEmpty && s.size < combo.size)
        partitions.foreach { left =>
          val right = combo -- left
          (best.get(left), best.get(right)) match {
            case (Some((lp, lc)), Some((rp, rc))) if connected(left, right) =>
              val outCard = card.calculateEstimate(graph, combo)
              val c = lc + rc + outCard.value
              if (bestPlan.forall(_._2 > c))
                bestPlan = Some((JoinNode(lp, rp, outCard), c))
            case _ =>
          }
        }
        bestPlan.foreach(best(combo) = _)
      }
    }
    best.getOrElse(tables.toSet,
      throw new IllegalStateException("DP found no connected plan"))._1
  }
}

/** Exhaustive enumeration of all join trees (catalan-number space; only for
  * small queries — reference: ExhaustiveJoinOrderEnumerator,
  * /root/reference/postbound/opt/enumeration.py:109). */
final class ExhaustivePlanEnumerator extends PlanEnumerator {
  def describe: String = """{"name":"exhaustive"}"""

  def generateExecutionPlan(q: QueryFacade, graph: JoinGraph,
      cost: CostModel, card: CardinalityEstimator): JoinTree[Cardinality] = {
    def ref(t: String) = graph.block.tables.find(_.identifier == t).get
    def connected(a: Set[String], b: Set[String]): Boolean =
      graph.edges.exists(e => e.tables.exists(a.contains) &&
        e.tables.exists(b.contains) && e.tables.subsetOf(a ++ b))
    def trees(ts: Set[String]): Seq[JoinTree[Cardinality]] =
      if (ts.size == 1) Seq(ScanNode(ref(ts.head),
        card.calculateEstimate(graph, ts)))
      else ts.subsets().filter(s => s.nonEmpty && s.size < ts.size)
        .filter(l => connected(l, ts -- l))
        .flatMap { l =>
          for (lt <- trees(l); rt <- trees(ts -- l))
            yield JoinNode(lt, rt, card.calculateEstimate(graph, ts))
        }.toSeq
    val all = trees(graph.tables.toSet)
    require(all.nonEmpty, "no connected join tree exists")
    all.minBy(t => cost.estimateCost(graph, t))
  }
}

/** Uniform-random left-deep join order with a fixed seed (reference:
  * RandomJoinOrderGenerator, /root/reference/postbound/opt/randomized.py:131).
  * Useful to demonstrate the core invariant: any order yields identical
  * results. */
final class RandomJoinOrderOptimizer(seed: Long = 42L) extends JoinOrderOptimization {
  def describe: String = s"""{"name":"random-join-order","seed":$seed}"""

  def optimizeJoinOrder(q: QueryFacade, graph: JoinGraph): Option[JoinTree[Cardinality]] = {
    val rnd = new scala.util.Random(seed)
    // random connected left-deep order
    val tables = rnd.shuffle(graph.tables)
    var joined = Set(tables.head)
    var order = Vector(tables.head)
    while (joined.size < graph.tables.size) {
      val nbrs = graph.neighbors(joined)
      if (nbrs.isEmpty) return None
      val pick = nbrs(rnd.nextInt(nbrs.size))
      joined += pick; order :+= pick
    }
    Some(JoinTree.leftDeep(order.map(t =>
      graph.block.tables.find(_.identifier == t).get)))
  }
}

/** No-op stages (reference: EmptyJoinOrderOptimizer etc., opt/noopt.py). */
object NoOptJoinOrder extends JoinOrderOptimization {
  def describe: String = """{"name":"noopt"}"""
  def optimizeJoinOrder(q: QueryFacade, graph: JoinGraph): Option[JoinTree[Cardinality]] = None
}

/** Extract the join fragment over a table subset as a standalone plan
  * (reference: extract_query_fragment, transform.py:296): filtered leaves
  * joined with every edge internal to the subset. */
object QueryFragment {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.Inner
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint,
    LogicalPlan}

  def fragmentPlan(graph: JoinGraph, tables: Set[String]): LogicalPlan = {
    val joined = tables.toSeq.sorted.map { t =>
      val leaf = graph.block.leafPlan(t)
      QueryFacade.andAll(graph.block.filtersFor(t))
        .map(Filter(_, leaf)).getOrElse(leaf)
    }.reduce[LogicalPlan]((l, r) => Join(l, r, Inner, None, JoinHint.NONE))
    val conds = graph.edges.filter(_.tables.subsetOf(tables)).map(_.expr)
    conds.reduceOption(And).map(Filter(_, joined)).getOrElse(joined)
  }
}

/** True cardinalities by executing COUNT(*) on every intermediate
  * (reference: PreciseCardinalities, /root/reference/postbound/opt/
  * _cardinalities.py:20 — embarrassingly parallel in Spark). */
final class PreciseCardinalities extends CardinalityEstimator {
  def describe: String = """{"name":"precise-cards"}"""
  def calculateEstimate(graph: JoinGraph, tables: Set[String]): Cardinality =
    Cardinality(graph.stats.rowCount(
      QueryFragment.fragmentPlan(graph, tables)).toDouble)
}

/** Cardinalities from a precomputed lookup (reference:
  * PreComputedCardinalities, opt/_cardinalities.py:95 — there loaded from
  * CSV; the map form composes with any loader). Falls back to the inner
  * estimator for missing intermediates. */
final class PreComputedCardinalities(lookup: Map[Set[String], Cardinality],
    fallback: CardinalityEstimator = new BasicCardinalityEstimator)
    extends CardinalityEstimator {
  def describe: String =
    s"""{"name":"precomputed-cards","entries":${lookup.size}}"""
  def calculateEstimate(graph: JoinGraph, tables: Set[String]): Cardinality =
    lookup.getOrElse(tables, fallback.calculateEstimate(graph, tables))
}

/** Parameter-generation stage that turns any cardinality estimator into
  * per-intermediate cardinality hints (reference: ParameterGeneration
  * emitting Rows hints, /root/reference/postbound/_stages.py:532-591 +
  * _hints.py:632). The hints are enforced by
  * [[graft.enforce.CardinalityInjection]]: each hinted intermediate's
  * optimized subplan is wrapped in a stats-override leaf that Spark's join
  * selection consults. Also hints every base table and (optionally) the
  * scans' single-table cardinalities post-filter.
  */
final class CardinalityHintGeneration(estimator: graft.pipeline.CardinalityEstimator,
    includeBaseTables: Boolean = true) extends graft.pipeline.ParameterGeneration {
  def describe: String =
    s"""{"name":"cardinality-hints","estimator":${estimator.describe}}"""
  def generatePlanParameters(q: graft.qal.QueryFacade, graph: JoinGraph,
      joinOrder: Option[graft.plans.JoinTree[Cardinality]],
      operators: graft.plans.PhysicalOperatorAssignment): graft.plans.PlanParameterization = {
    val intermediates = joinOrder.map(_.intermediates).getOrElse(Seq.empty)
    val singles =
      if (includeBaseTables) graph.tables.map(t => Set(t)) else Seq.empty
    val hints = (intermediates ++ singles).distinct.map { ts =>
      ts -> estimator.calculateEstimate(graph, ts)
    }.filter(_._2.isValid).toMap
    graft.plans.PlanParameterization(cardinalityHints = hints)
  }
}

/** Perturb another estimator's numbers to study sensitivity (reference:
  * CardinalityDistortion, opt/_cardinalities.py:306). */
final class CardinalityDistortion(inner: CardinalityEstimator, factor: Double,
    seed: Long = 42L) extends CardinalityEstimator {
  private val rnd = new scala.util.Random(seed)
  def describe: String =
    s"""{"name":"distortion","factor":$factor,"inner":${inner.describe}}"""
  def calculateEstimate(graph: JoinGraph, tables: Set[String]): Cardinality = {
    val base = inner.calculateEstimate(graph, tables)
    Cardinality(base.value * (1.0 + (rnd.nextDouble() * 2 - 1) * factor))
  }
}
