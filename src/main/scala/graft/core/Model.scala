package graft.core

/** Core data model, the Spark-native re-expression of the reference's
  * fundamental abstractions (see SURVEY §1.1; reference:
  * /root/reference/postbound/_core.py:624-1189 for table/column refs,
  * :22-397 for Cardinality, :400-468 for the physical-operator enums).
  */

/** A (possibly aliased) table reference. `virtual` marks derived tables
  * (subquery/CTE results) that have no backing relation.
  */
final case class TableRef(fullName: String, alias: Option[String] = None,
    virtual: Boolean = false) {
  /** The name the table is addressed by in predicates. */
  def identifier: String = alias.getOrElse(fullName)
  override def toString: String =
    alias.filter(_ != fullName).map(a => s"$fullName AS $a").getOrElse(fullName)
}

/** A column, optionally bound to its table. */
final case class ColumnRef(name: String, table: Option[TableRef] = None) {
  override def toString: String =
    table.map(t => s"${t.identifier}.$name").getOrElse(name)
}

/** Non-negative row-count estimate with unknown (NaN) and infinite states,
  * mirroring the reference's Cardinality numeric tower. A value class over
  * Double keeps the full numeric algebra for free.
  */
final case class Cardinality(value: Double) extends AnyVal with Ordered[Cardinality] {
  def isUnknown: Boolean = value.isNaN
  def isInfinite: Boolean = value.isInfinity
  def isValid: Boolean = !isUnknown && !isInfinite && value >= 0
  def +(o: Cardinality): Cardinality = Cardinality(value + o.value)
  def *(o: Cardinality): Cardinality = Cardinality(value * o.value)
  def min(o: Cardinality): Cardinality =
    if (isUnknown) o else if (o.isUnknown) this
    else Cardinality(math.min(value, o.value))
  def compare(o: Cardinality): Int = java.lang.Double.compare(value, o.value)
  def toLongOption: Option[Long] = if (isValid) Some(value.round) else None
  override def toString: String =
    if (isUnknown) "?" else if (isInfinite) "inf" else value.round.toString
}

object Cardinality {
  val unknown: Cardinality = Cardinality(Double.NaN)
  val infinite: Cardinality = Cardinality(Double.PositiveInfinity)
  def of(n: Long): Cardinality = Cardinality(n.toDouble)
}

/** Unit-less cost; only comparable within one cost model (same caveat as
  * reference /root/reference/postbound/_qep.py:416-424).
  */
object CostModelTypes { type Cost = Double }

/** Scan operators. Spark has no index structures: Seq maps to a file scan,
  * Index(-Only) to a scan with pushed filters / pruned columns / partition
  * pruning, Bitmap has no analog (kept for representation parity, enforcing
  * it raises).
  */
sealed trait ScanOperator { def name: String }
object ScanOperator {
  case object SeqScan extends ScanOperator { val name = "SeqScan" }
  case object IndexScan extends ScanOperator { val name = "IndexScan" }
  case object IndexOnlyScan extends ScanOperator { val name = "IndexOnlyScan" }
  case object BitmapScan extends ScanOperator { val name = "BitmapScan" }
  val all: Seq[ScanOperator] = Seq(SeqScan, IndexScan, IndexOnlyScan, BitmapScan)
}

/** Join operators with their Spark join-strategy hint (the enforcement
  * vehicle — exact analog of the reference's per-join hints,
  * /root/reference/postbound/postgres.py:2236-2272).
  */
sealed trait JoinOperator { def name: String; def sparkHint: String }
object JoinOperator {
  case object NestedLoopJoin extends JoinOperator {
    val name = "NestedLoopJoin"; val sparkHint = "shuffle_replicate_nl"
  }
  case object HashJoin extends JoinOperator {
    val name = "HashJoin"; val sparkHint = "shuffle_hash"
  }
  case object SortMergeJoin extends JoinOperator {
    val name = "SortMergeJoin"; val sparkHint = "merge"
  }
  /** Nearest Spark analog of an index-NLJ: broadcast the lookup side. */
  case object IndexNestedLoopJoin extends JoinOperator {
    val name = "IndexNestedLoopJoin"; val sparkHint = "broadcast"
  }
  case object BroadcastHashJoin extends JoinOperator {
    val name = "BroadcastHashJoin"; val sparkHint = "broadcast"
  }
  val all: Seq[JoinOperator] =
    Seq(NestedLoopJoin, HashJoin, SortMergeJoin, IndexNestedLoopJoin, BroadcastHashJoin)
}

/** Intermediate (non scan/join) physical operators. */
sealed trait IntermediateOperator { def name: String }
object IntermediateOperator {
  case object Sort extends IntermediateOperator { val name = "Sort" }
  case object Memoize extends IntermediateOperator { val name = "Memoize" }
  case object Materialize extends IntermediateOperator { val name = "Materialize" }
}
