package graft.opt

import graft.core.{Cardinality, ColumnRef, JoinOperator}
import graft.pipeline.CardinalityEstimator
import graft.plans.{JoinNode, JoinTree, PhysicalOperatorAssignment, ScanNode}
import graft.qal.QueryFacade

/** Sort-order-aware dynamic programming — the PostgresDynProg flavor of the
  * reference (/root/reference/postbound/opt/dynprog.py:536: PG-faithful DP,
  * "sort-order aware" via interesting orders / RelOptInfo pathkeys).
  *
  * Each DP entry keeps the best plan per (table subset, delivered order),
  * where an order is the equi-join equivalence class the output is sorted
  * on (System-R interesting orders). Physical operators are chosen inside
  * the DP: a sort-merge join delivers its key's order and pays no sort for
  * an input that already delivers it, so chains of joins over one
  * equivalence class (n_nationkey-style star arms) become sort-free merge
  * cascades; hash joins are cheaper for isolated equi-joins but deliver no
  * order. Costs are C_out-style with explicit sort terms (n log n).
  *
  * Returns the winning tree AND its per-intermediate operator assignment —
  * unlike the plain enumerator interface, operator choice here is a DP
  * decision, not a separate stage (exactly why the reference models this
  * variant separately from its textbook DP).
  */
  /** @param hashBuildCostPerRow cost of inserting one build-side row into a
    *   hash table, relative to one C_out output row. With the default the
    *   model behaves like Postgres on unsorted inputs (hash joins win
    *   isolated equi-joins); raise it (memory-pressure regime) and merge
    *   cascades with order reuse take over.
    */
final class SortAwareDynProg(hashBuildCostPerRow: Double = 2.0) {
  import SortAwareDynProg.Entry

  /** Interesting order = index of an equivalence class. */
  private type Order = Option[Int]

  def describe: String = """{"name":"dynprog-sort-aware","orders":"equivalence-classes"}"""

  def plan(q: QueryFacade, graph: JoinGraph, card: CardinalityEstimator):
      (JoinTree[Cardinality], PhysicalOperatorAssignment) = {
    val tables = graph.tables.toVector
    val classes: Seq[Set[ColumnRef]] = graph.equivalenceClasses
    def classOf(c: ColumnRef): Option[Int] =
      classes.zipWithIndex.find(_._1.contains(c)).map(_._2)
    def ref(t: String) = graph.block.tables.find(_.identifier == t).get

    def rows(ts: Set[String]): Double =
      math.max(card.calculateEstimate(graph, ts).value, 1.0)
    def sortCost(n: Double): Double = n * math.max(math.log(n) / math.log(2), 1.0)

    // best(subset)(order) = cheapest plan delivering that order
    val best = scala.collection.mutable.Map.empty[Set[String],
      scala.collection.mutable.Map[Order, Entry]]

    def offer(ts: Set[String], order: Order, e: Entry): Unit = {
      val slot = best.getOrElseUpdate(ts, scala.collection.mutable.Map.empty)
      if (slot.get(order).forall(_.cost > e.cost)) slot(order) = e
    }

    tables.foreach { t =>
      val n = rows(Set(t))
      offer(Set(t), None,
        Entry(ScanNode(ref(t), Cardinality(n)), 0.0, Map.empty))
    }

    for (size <- 2 to tables.size) {
      tables.combinations(size).foreach { comboSeq =>
        val combo = comboSeq.toSet
        combo.subsets().filter(s => s.nonEmpty && s.size < combo.size)
          .foreach { left =>
            val right = combo -- left
            // the classes connecting left and right (equi edges only)
            val connecting = graph.edges
              .filter(e => e.tables.subsetOf(combo) &&
                e.tables.exists(left.contains) && e.tables.exists(right.contains))
              .flatMap(_.equiColumns).flatMap { case (a, b) => classOf(a) }
              .distinct
            if (connecting.nonEmpty) {
              val outRows = rows(combo)
              for {
                (lo, le) <- best.getOrElse(left, Map.empty)
                (ro, re) <- best.getOrElse(right, Map.empty)
              } {
                val base = le.cost + re.cost + outRows
                // hash join: no order delivered, no sort needed
                offer(combo, None, Entry(
                  JoinNode(le.tree, re.tree, Cardinality(outRows)),
                  base + hashBuildCostPerRow * rows(right) /* build side */,
                  le.ops ++ re.ops + (combo -> JoinOperator.HashJoin)))
                // sort-merge per connecting class: pay sorts only for
                // inputs not already delivering the class's order
                connecting.foreach { cls =>
                  val lSort = if (lo.contains(cls)) 0.0 else sortCost(rows(left))
                  val rSort = if (ro.contains(cls)) 0.0 else sortCost(rows(right))
                  offer(combo, Some(cls), Entry(
                    JoinNode(le.tree, re.tree, Cardinality(outRows)),
                    base + lSort + rSort,
                    le.ops ++ re.ops + (combo -> JoinOperator.SortMergeJoin)))
                }
              }
            }
          }
      }
    }

    val finalSlot = best.getOrElse(tables.toSet,
      throw new IllegalStateException("no connected plan"))
    val winner = finalSlot.values.minBy(_.cost)
    (winner.tree, PhysicalOperatorAssignment(joinOperators = winner.ops))
  }
}

private object SortAwareDynProg {
  final case class Entry(tree: JoinTree[Cardinality], cost: Double,
      ops: Map[Set[String], JoinOperator])
}
