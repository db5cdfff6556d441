package graft.plans

import graft.core.{Cardinality, JoinOperator, ScanOperator, TableRef}

/** Join tree: scan leaves + binary join nodes with a generic annotation,
  * port of the reference's JoinTree[A] / LogicalJoinTree
  * (/root/reference/postbound/_hints.py:1230-1748). `outer` is the build /
  * left side, `inner` the probe / right side — compiled left-anchored into
  * Catalyst Join nodes by the enforcer.
  */
sealed trait JoinTree[+A] {
  def annotation: A
  def tables: Seq[TableRef] = this match {
    case ScanNode(t, _) => Seq(t)
    case JoinNode(o, i, _) => o.tables ++ i.tables
  }
  def tableSet: Set[String] = tables.map(_.identifier).toSet
  def depth: Int = this match {
    case _: ScanNode[_] => 1
    case JoinNode(o, i, _) => 1 + math.max(o.depth, i.depth)
  }
  def joinCount: Int = this match {
    case _: ScanNode[_] => 0
    case JoinNode(o, i, _) => 1 + o.joinCount + i.joinCount
  }
  /** Left-deep: every inner child is a scan. */
  def isLeftDeep: Boolean = this match {
    case _: ScanNode[_] => true
    case JoinNode(o, i, _) => i.isInstanceOf[ScanNode[_]] && o.isLeftDeep
  }
  def isRightDeep: Boolean = this match {
    case _: ScanNode[_] => true
    case JoinNode(o, i, _) => o.isInstanceOf[ScanNode[_]] && i.isRightDeep
  }
  /** Zig-zag: each join has at least one scan child (includes left/right deep). */
  def isZigZag: Boolean = this match {
    case _: ScanNode[_] => true
    case JoinNode(o, i, _) =>
      (o.isInstanceOf[ScanNode[_]] || i.isInstanceOf[ScanNode[_]]) &&
        o.isZigZag && i.isZigZag
  }
  def isLinear: Boolean = isZigZag
  def isBushy: Boolean = !isZigZag
  def map[B](f: A => B): JoinTree[B] = this match {
    case ScanNode(t, a) => ScanNode(t, f(a))
    case JoinNode(o, i, a) => JoinNode(o.map(f), i.map(f), f(a))
  }
  /** All intermediate (join-node) table subsets, bottom-up. */
  def intermediates: Seq[Set[String]] = this match {
    case _: ScanNode[_] => Seq.empty
    case j @ JoinNode(o, i, _) => o.intermediates ++ i.intermediates :+ j.tableSet
  }
  def render: String = this match {
    case ScanNode(t, a) => s"${t.identifier}[$a]"
    case JoinNode(o, i, a) => s"(${o.render} JOIN ${i.render})[$a]"
  }
}

final case class ScanNode[A](table: TableRef, annotation: A) extends JoinTree[A]
final case class JoinNode[A](outer: JoinTree[A], inner: JoinTree[A],
    annotation: A) extends JoinTree[A]

object JoinTree {
  type LogicalJoinTree = JoinTree[Cardinality]

  /** Left-deep tree from a table order (annotations unknown). */
  def leftDeep(order: Seq[TableRef]): LogicalJoinTree =
    order.map(t => ScanNode(t, Cardinality.unknown): LogicalJoinTree)
      .reduceLeft((acc, s) => JoinNode(acc, s, Cardinality.unknown))
}

/** Physical operator choices for a query: per-join (keyed by the joined
  * table set), per-scan, plus globally disabled operators. Port of
  * PhysicalOperatorAssignment (/root/reference/postbound/_hints.py:25-120).
  */
final case class PhysicalOperatorAssignment(
    joinOperators: Map[Set[String], JoinOperator] = Map.empty,
    scanOperators: Map[String, ScanOperator] = Map.empty,
    disabledJoinOps: Set[JoinOperator] = Set.empty,
    defaultJoin: Option[JoinOperator] = None) {
  def withJoin(tables: Set[String], op: JoinOperator): PhysicalOperatorAssignment =
    copy(joinOperators = joinOperators + (tables -> op))
  def operatorFor(tables: Set[String]): Option[JoinOperator] =
    joinOperators.get(tables).orElse(defaultJoin)
      .filterNot(disabledJoinOps.contains)
}

/** Additional plan parameters: per-intermediate cardinality hints and
  * session configs to pin during execution. Port of PlanParameterization
  * (/root/reference/postbound/_hints.py:632).
  */
final case class PlanParameterization(
    cardinalityHints: Map[Set[String], Cardinality] = Map.empty,
    parallelWorkers: Option[Int] = None,
    sessionConfigs: Map[String, String] = Map.empty)
