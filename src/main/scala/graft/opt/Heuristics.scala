package graft.opt

import graft.core.Cardinality
import graft.pipeline.{CardinalityEstimator, CostModel, PlanEnumerator}
import graft.plans.{JoinNode, JoinTree, ScanNode}
import graft.qal.QueryFacade

/** Polynomial-time join-ordering heuristics complementing the exact
  * enumerators in [[graft.opt]]: GOO (bushy, greedy) and IKKBZ (left-deep,
  * optimal for acyclic graphs under ASI cost functions). The reference
  * frames the same trade-off — its exact DP
  * (/root/reference/postbound/opt/dynprog.py:79) is exponential in table
  * count, and its randomized fallbacks
  * (/root/reference/postbound/opt/randomized.py:131) give no quality
  * guarantee; these two close the gap for the many-join workloads (JOB
  * kit, 8-12-way) where DP's 2^n subsets stop being cheap on the driver.
  */
object Heuristics

/** Greedy Operator Ordering (Fegaras, DEXA 1998): start from the base
  * relations, repeatedly join the connected pair of partial trees whose
  * result cardinality is smallest, until one tree remains. O(n^2)
  * estimator calls, produces bushy trees, and on star/clique graphs tracks
  * the DP optimum closely while never materializing the 2^n subset table.
  * Cross products are taken only when no connected pair remains (mirrors
  * the DP/exhaustive enumerators' connectivity rule).
  */
final class GreedyOperatorOrdering extends PlanEnumerator {
  def describe: String = """{"name":"goo","shape":"bushy"}"""

  def generateExecutionPlan(q: QueryFacade, graph: JoinGraph,
      cost: CostModel, card: CardinalityEstimator): JoinTree[Cardinality] = {
    def ref(t: String) = graph.block.tables.find(_.identifier == t).get
    def connected(a: Set[String], b: Set[String]): Boolean =
      graph.edges.exists(e => e.tables.exists(a.contains) &&
        e.tables.exists(b.contains) && e.tables.subsetOf(a ++ b))

    var forest: Vector[JoinTree[Cardinality]] = graph.tables.toVector
      .map(t => ScanNode(ref(t), card.calculateEstimate(graph, Set(t))))
    while (forest.size > 1) {
      val pairs = for {
        i <- forest.indices; j <- forest.indices if i < j
      } yield (i, j, connected(forest(i).tableSet, forest(j).tableSet))
      val candidates = if (pairs.exists(_._3)) pairs.filter(_._3) else pairs
      val scored = candidates.map { case (i, j, _) =>
        val c = card.calculateEstimate(graph,
          forest(i).tableSet ++ forest(j).tableSet)
        (i, j, c)
      }
      val (bi, bj, bc) = scored.minBy(_._3.value)
      val joined = JoinNode(forest(bi), forest(bj), bc)
      forest = forest.zipWithIndex
        .collect { case (t, k) if k != bi && k != bj => t } :+ joined
    }
    forest.head
  }
}

/** IKKBZ (Ibaraki & Kameda 1984; Krishnamurthy, Boral & Zaniolo 1986):
  * produces the cost-optimal left-deep, cross-product-free join order in
  * O(n^2) for ACYCLIC join graphs under ASI ("adjacent sequence
  * interchange") cost functions, via rank-ordering over the precedence
  * tree with chain normalization. For cyclic graphs the algorithm runs on
  * a min-selectivity spanning tree (the standard relaxation), after which
  * the full edge set still applies at execution. Every candidate root is
  * linearized and the winner is chosen by the caller-supplied cost model
  * on the ACTUAL estimator — so a mediocre ASI-internal model cannot
  * override a better-informed caller cost function.
  */
final class IkkbzEnumerator extends PlanEnumerator {
  def describe: String = """{"name":"ikkbz","shape":"left-deep"}"""

  /** A segment of the (partially merged) chain: a fixed relation sequence
    * with aggregated T (product of selectivity-scaled cardinalities) and
    * C (ASI cost). rank = (T - 1) / C is the ASI ordering key.
    */
  private final case class Seg(rels: Vector[String], t: Double, c: Double) {
    def rank: Double = if (c <= 0) Double.MaxValue else (t - 1.0) / c
    def ++(o: Seg): Seg = Seg(rels ++ o.rels, t * o.t, c + t * o.c)
  }

  def generateExecutionPlan(q: QueryFacade, graph: JoinGraph,
      cost: CostModel, card: CardinalityEstimator): JoinTree[Cardinality] = {
    val tables = graph.tables.toVector
    def ref(t: String) = graph.block.tables.find(_.identifier == t).get
    val n: Map[String, Double] = tables.map(t =>
      t -> math.max(card.calculateEstimate(graph, Set(t)).value, 1.0)).toMap
    // per-edge selectivity from the estimator's own pairwise estimates, so
    // IKKBZ and the surrounding pipeline agree on what an edge is worth
    def sel(a: String, b: String): Double = {
      val pair = card.calculateEstimate(graph, Set(a, b)).value
      math.min(1.0, math.max(pair / (n(a) * n(b)), 1e-18))
    }
    val adjacent: Map[String, Seq[String]] = tables.map { t =>
      t -> tables.filter(o => o != t &&
        graph.edges.exists(e => e.tables == Set(t, o)))
    }.toMap

    // min-selectivity spanning tree (Kruskal) — identity for acyclic graphs
    val allPairs = (for {
      a <- tables; b <- tables if a < b && adjacent(a).contains(b)
    } yield (a, b, sel(a, b))).sortBy(_._3)
    val parent = scala.collection.mutable.Map(tables.map(t => t -> t): _*)
    def find(t: String): String =
      if (parent(t) == t) t else { val r = find(parent(t)); parent(t) = r; r }
    val treeEdges = allPairs.filter { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { parent(ra) = rb; true } else false
    }
    val treeAdj: Map[String, Seq[String]] = tables.map { t =>
      t -> treeEdges.collect {
        case (a, b, _) if a == t => b
        case (a, b, _) if b == t => a
      }
    }.toMap

    /** Normalized chain of the precedence subtree under `v` (excluding v):
      * children chains are rank-merged, then any head violating v's
      * precedence is handled by the CALLER absorbing it — here we only
      * guarantee each child subtree yields a non-decreasing-rank chain
      * whose internal precedence constraints are baked into merged Segs.
      */
    def chain(v: String, from: String): Vector[Seg] = {
      val own = Seg(Vector(v), sel(from, v) * n(v), sel(from, v) * n(v))
      // child chains are already internally normalized (non-decreasing
      // rank, intra-subtree precedence folded into compound Segs), so a
      // rank-merge of siblings stays sorted and precedence-safe
      val merged = treeAdj(v).filter(_ != from).map(k => chain(k, v))
        .foldLeft(Vector.empty[Seg])(mergeByRank)
      absorb(own, merged)
    }
    def mergeByRank(a: Vector[Seg], b: Vector[Seg]): Vector[Seg] =
      (a ++ b).sortBy(_.rank)
    // precedence: v must precede everything in its subtree chain; while
    // the chain head ranks below v, fold it into v's compound segment and
    // re-check (the compound's rank moves, possibly absorbing more) —
    // the IKKBZ normalization step
    def absorb(v: Seg, chainSegs: Vector[Seg]): Vector[Seg] = {
      var head = v; var rest = chainSegs
      while (rest.nonEmpty && rest.head.rank < head.rank) {
        head = head ++ rest.head; rest = rest.tail
      }
      head +: rest
    }

    def orderFor(root: String): Vector[String] = {
      val kids = treeAdj(root).map(k => chain(k, root))
      val merged = kids.foldLeft(Vector.empty[Seg])(mergeByRank)
      val order = root +: merged.flatMap(_.rels)
      // disconnected graphs leave a spanning FOREST: append unreachable
      // tables (cross products) smallest-first, matching how the DP
      // enumerator would be forced to take them
      val missing = tables.filterNot(order.contains).sortBy(n)
      order ++ missing
    }

    def treeOf(order: Vector[String]): JoinTree[Cardinality] = {
      val head: JoinTree[Cardinality] =
        ScanNode(ref(order.head), card.calculateEstimate(graph, Set(order.head)))
      order.tail.foldLeft(head) { (acc, t) =>
        val ts = acc.tableSet + t
        JoinNode(acc,
          ScanNode(ref(t), card.calculateEstimate(graph, Set(t))),
          card.calculateEstimate(graph, ts))
      }
    }
    tables.map(r => treeOf(orderFor(r)))
      .minBy(t => cost.estimateCost(graph, t))
  }
}
