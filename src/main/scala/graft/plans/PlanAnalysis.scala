package graft.plans

import graft.core.Cardinality

/** Plan-analysis helpers, port of the reference's analysis module
  * (/root/reference/postbound/opt/_analysis.py:30-673: possible_plans_bound,
  * jointree similarity, compare_query_plans).
  */
object PlanAnalysis {

  /** Number of distinct join trees over n relations: catalan(n-1) * n! / 2^(n-1)
    * for unordered binary trees; the reference reports the standard
    * (2(n-1))! / (n-1)! bound for ordered bushy trees. */
  def possiblePlansBound(nTables: Int): BigInt = {
    if (nTables < 2) return BigInt(1)
    def fact(k: Int): BigInt = (1 to k).map(BigInt(_)).product
    fact(2 * (nTables - 1)) / fact(nTables - 1)
  }

  /** Structural similarity of two join trees in [0, 1]: Jaccard overlap of
    * their intermediate table-sets (the reference's jointree similarity is
    * likewise containment-based). 1.0 = identical shapes over the same
    * tables. */
  def treeSimilarity(a: JoinTree[_], b: JoinTree[_]): Double = {
    val ia = a.intermediates.toSet + a.tableSet
    val ib = b.intermediates.toSet + b.tableSet
    if (ia.isEmpty && ib.isEmpty) 1.0
    else (ia & ib).size.toDouble / (ia | ib).size.toDouble
  }

  /** Leaf-order edit agreement: fraction of positions where the two trees'
    * base-table orders match (crude but monotone under local swaps —
    * companion to the reference's levenshtein-based comparison). */
  def orderAgreement(a: JoinTree[_], b: JoinTree[_]): Double = {
    val oa = a.tables.map(_.identifier)
    val ob = b.tables.map(_.identifier)
    if (oa.isEmpty) return 1.0
    oa.zip(ob).count { case (x, y) => x == y }.toDouble / math.max(oa.size, ob.size)
  }

  /** Compare two annotated trees: per-intermediate cardinality q-errors
    * for the subsets both plans materialize. */
  def compareCardinalities(a: JoinTree[Cardinality],
      b: JoinTree[Cardinality]): Map[Set[String], Double] = {
    def cardsOf(t: JoinTree[Cardinality]): Map[Set[String], Cardinality] =
      t match {
        case _: ScanNode[Cardinality] => Map.empty
        case j @ JoinNode(o, i, c) =>
          cardsOf(o) ++ cardsOf(i) + (j.tableSet -> c)
      }
    val (ca, cb) = (cardsOf(a), cardsOf(b))
    (ca.keySet & cb.keySet).map { k =>
      val (x, y) = (math.max(ca(k).value, 1.0), math.max(cb(k).value, 1.0))
      k -> math.max(x / y, y / x)
    }.toMap
  }
}
