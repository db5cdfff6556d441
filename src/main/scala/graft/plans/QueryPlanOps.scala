package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BaseJoinExec
import graft.core.Cardinality

/** Introspection over an executed (or executable) Spark physical plan —
  * the Spark-side analog of the reference's QueryPlan wrapper
  * (/root/reference/postbound/_qep.py:791-1978): estimates, actuals,
  * q-error, C_out, canonical shape, join-operator and scan-order queries.
  * Estimates come from the optimized logical plan; actuals from SQLMetrics
  * after an action ran (no EXPLAIN text parsing anywhere).
  */
final class QueryPlanOps(df: DataFrame) {

  /** Physical plan with AQE unwrapped to the currently-final plan. */
  def physicalPlan: SparkPlan = df.queryExecution.executedPlan match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case p => p
  }

  /** Join operator node names, top-down (e.g. SortMergeJoinExec). */
  def joinOperators: Seq[String] =
    physicalPlan.collect { case j: BaseJoinExec => j.nodeName }

  /** Base-relation scan order = in-order leaf traversal; for parquet scans
    * the table is identified by the file name. */
  def scanOrder: Seq[String] =
    physicalPlan.collect { case s: FileSourceScanExec =>
      s.relation.location.rootPaths.headOption
        .map(_.getName.stripSuffix(".parquet")).getOrElse("?")
    }

  /** Optimizer row estimate of the root. */
  def estimatedRows: Cardinality = {
    val stats = df.queryExecution.optimizedPlan.stats
    stats.rowCount.map(rc => Cardinality(rc.toDouble))
      .getOrElse(Cardinality.unknown)
  }

  /** Actual output rows per join node (after an action has executed). */
  def actualJoinRows: Seq[Long] =
    physicalPlan.collect { case j: BaseJoinExec =>
      j.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
    }

  /** C_out over actual metrics: sum of join output cardinalities
    * (reference: QueryPlan.cout, _qep.py:1550). */
  def cout: Double = actualJoinRows.filter(_ >= 0).map(_.toDouble).sum

  /** q-error between an estimate and an actual cardinality (reference:
    * QueryPlan.qerror, _qep.py:1575). */
  def qerror(estimate: Double, actual: Double): Double = {
    val e = math.max(estimate, 1.0); val a = math.max(actual, 1.0)
    math.max(e / a, a / e)
  }

  /** Reconstruct the logical join tree from the physical plan, annotated
    * with actual output rows where available (reference:
    * jointree_from_plan, _hints.py:1766) — the bridge that lets learned
    * stages (TONIC) ingest plans Spark chose natively. None when the plan
    * is not a pure join tree over file scans (e.g. unions). */
  def joinTree: Option[JoinTree[Cardinality]] = {
    def rowsOf(p: SparkPlan): Cardinality =
      p.metrics.get("numOutputRows")
        .map(m => Cardinality(m.value.toDouble))
        .getOrElse(Cardinality.unknown)
    def walk(p: SparkPlan): Option[JoinTree[Cardinality]] = p match {
      case j: BaseJoinExec =>
        for (l <- walk(j.left); r <- walk(j.right))
          yield JoinNode(l, r, rowsOf(j))
      case s: FileSourceScanExec =>
        val name = s.relation.location.rootPaths.headOption
          .map(_.getName.stripSuffix(".parquet")).getOrElse("?")
        Some(ScanNode(graft.core.TableRef(name), rowsOf(s)))
      // AQE materializes exchanges as query stages that report NO
      // children (`plan` holds the subtree) — without this case every
      // joinTree under adaptive execution dies at the first stage
      // boundary
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        walk(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        walk(r.child)
      case other => other.children match {
        case Seq(only) => walk(only)
        case _ => None
      }
    }
    walk(physicalPlan)
  }

  /** Key facts of the plan in one map (reference: plan_summary,
    * _qep.py:1864). */
  def planSummary: Map[String, String] = {
    val tree = joinTree
    Map(
      "joins" -> joinOperators.size.toString,
      "join_operators" -> joinOperators.mkString("|"),
      "scan_order" -> scanOrder.mkString("|"),
      "shape" -> tree.map(t =>
        if (t.isLeftDeep) "left-deep"
        else if (t.isRightDeep) "right-deep"
        else if (t.isZigZag) "zigzag" else "bushy").getOrElse("n/a"),
      "estimated_rows" -> estimatedRows.toString,
      "cout" -> cout.toString)
  }

  /** Canonical plan string: operator tree without exchanges/codegen wrappers
    * (reference: QueryPlan.canonical, _qep.py:1793). */
  def canonical: String = {
    def walk(p: SparkPlan): Seq[String] = {
      val name = p.nodeName
      val keep = !name.contains("Exchange") && !name.contains("WholeStageCodegen") &&
        !name.contains("InputAdapter") && !name.contains("AQEShuffleRead") &&
        !name.contains("ShuffleQueryStage") && !name.contains("BroadcastQueryStage")
      val kids = p.children.flatMap(walk)
      if (keep) Seq(s"$name(${kids.mkString(",")})") else kids
    }
    walk(physicalPlan).mkString(",")
  }
}

object QueryPlanOps {
  def apply(df: DataFrame): QueryPlanOps = new QueryPlanOps(df)
}
