package graft.enforce

import org.apache.spark.sql.{DataFrame, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, ExprId}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LeafNode, LogicalPlan,
  Statistics}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import graft.core.Cardinality
import graft.opt.JoinGraph

/** Per-intermediate cardinality injection — the Spark-native equivalent of
  * the reference's `Rows(a b #42)` pg_hint_plan hints
  * (/root/reference/postbound/postgres.py:2289-2301, carried in
  * PlanParameterization, /root/reference/postbound/_hints.py:632).
  *
  * Spark has no "Rows" hint, and a plain UnaryNode wrapper cannot inject
  * stats: the logical stats visitors (SizeInBytesOnlyStatsPlanVisitor /
  * BasicStatsPlanVisitor) only consult `computeStats()` on **leaf** nodes —
  * for every other node they derive stats from the children. So the
  * override node is a [[LeafNode]] that *wraps an already-optimized
  * subplan*: join selection for every enclosing join then reads exactly the
  * injected row count / size, while a paired [[SparkStrategy]] plans the
  * wrapped child for execution.
  *
  * Order of operations matters for scale: the wrapper is spliced in AFTER
  * Catalyst fully optimized the plan (filter pushdown, column pruning,
  * constant folding have all reached the scans), because a leaf boundary
  * is opaque to the optimizer — wrapping earlier would leave the subplan
  * under it unpruned. The rewritten plan is re-planned from the optimized
  * tree, so only join-strategy selection sees the new numbers; the data
  * flow is untouched and results are bit-identical.
  *
  * AQE caveat (SURVEY §7.4-1): adaptive execution re-plans joins from
  * *actual* runtime sizes, which can override injected estimates at stage
  * boundaries. For strict what-if experiments disable AQE; with AQE on the
  * injection still steers the initial plan (and AQE's corrections are
  * usually the right call in production).
  */
final case class StatsOverride(child: LogicalPlan, rowCount: BigInt,
    tableSet: Set[String]) extends LeafNode {
  override def output: Seq[Attribute] = child.output

  /** Consulted by both stats visitors (leaf nodes delegate here). Size is
    * estimated as rowCount x flat row width — the same formula Catalyst's
    * EstimationUtils uses when only a row count is known. */
  override def computeStats(): Statistics = {
    val rowSize = 8L + output.map(_.dataType.defaultSize.toLong).sum
    Statistics(
      sizeInBytes = (rowCount * rowSize).max(1),
      rowCount = Some(rowCount.max(0)))
  }

  override def simpleString(maxFields: Int): String =
    s"StatsOverride rows=$rowCount tables=${tableSet.toSeq.sorted.mkString(",")}"
}

/** Plans the wrapped subplan; the leaf exists only to carry statistics. */
object StatsOverrideStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case so: StatsOverride => planLater(so.child) :: Nil
    case _ => Nil
  }
}

object CardinalityInjection {

  /** Idempotently register the execution strategy on the session. (On a
    * cluster, prefer registering [[graft.GraftExtensions]] via
    * `spark.sql.extensions` so every session has it from the start.) */
  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(StatsOverrideStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ StatsOverrideStrategy
  }

  /** Splice stats overrides into `df`'s *optimized* plan: every join
    * subtree (or scan side) whose base-table set has a hint is wrapped in
    * a [[StatsOverride]] leaf carrying the hinted cardinality.
    * Hints with unknown/infinite cardinalities are ignored.
    */
  def inject(spark: SparkSession, df: DataFrame, graph: JoinGraph,
      hints: Map[Set[String], Cardinality]): DataFrame = {
    val valid: Map[Set[String], BigInt] = hints.flatMap {
      case (ts, c) => c.toLongOption.map(n => ts -> BigInt(n))
    }
    if (valid.isEmpty) return df
    ensureRegistered(spark)

    // Attribute provenance: analysis-time ExprIds survive optimization, so
    // the base tables under any optimized subtree can be recovered from its
    // leaf outputs even after aliases were eliminated and columns pruned.
    val attrToTable: Map[ExprId, String] = graph.tables.flatMap { t =>
      graph.block.leafPlan(t).output.map(_.exprId -> t)
    }.toMap

    def tablesOf(p: LogicalPlan): Set[String] = p.collect {
      case so: StatsOverride => so.tableSet
      case l: LeafNode => l.output.flatMap(a => attrToTable.get(a.exprId)).toSet
    }.flatten.toSet

    def maybeWrap(p: LogicalPlan): LogicalPlan = p match {
      case so: StatsOverride => so
      case _ =>
        val ts = tablesOf(p)
        valid.get(ts).map(StatsOverride(p, _, ts)).getOrElse(p)
    }

    val optimized = df.queryExecution.optimizedPlan
    val rewritten = optimized.transformUp {
      case j: Join =>
        val l2 = maybeWrap(j.left)
        val r2 = maybeWrap(j.right)
        val j2 =
          if ((l2 eq j.left) && (r2 eq j.right)) j
          else j.copy(left = l2, right = r2)
        maybeWrap(j2)
    }
    if (rewritten eq optimized) df else GraftShims.ofRows(spark, rewritten)
  }
}
