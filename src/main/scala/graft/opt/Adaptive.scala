package graft.opt

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Cardinality
import graft.pipeline.{CardinalityEstimator, TextBookOptimizationPipeline}
import graft.plans.{JoinNode, JoinTree, QueryPlanOps, ScanNode}
import graft.stats.EmulatedStatistics

/** Runtime-feedback re-optimization: execute a first-pass plan, harvest the
  * ACTUAL per-intermediate cardinalities from the executed plan's
  * SQLMetrics, and optimize again with those actuals as pre-computed
  * cardinalities. This closes the reference's research loop
  * (learn_from_feedback, /root/reference/postbound/_stages.py:46-120;
  * actual-vs-estimate analysis, /root/reference/postbound/opt/_analysis.py)
  * at the plan level rather than the operator level (TONIC's trie does the
  * operator side).
  *
  * Scale rationale: the actuals are FREE — Spark already counted every
  * operator's output rows while executing (numOutputRows SQLMetric), so
  * harvesting costs zero extra jobs at any data size. The observed path
  * only yields cardinalities for the intermediates the first plan
  * materialized; everything off-path falls back to the supplied estimator,
  * which is exactly the estimator-risk re-optimization trades away on the
  * observed prefix.
  */
object AdaptiveReoptimization {

  /** (table-set -> actual rows) for every node of an executed plan whose
    * join tree is reconstructable; unknown metrics are skipped. */
  def harvest(df: DataFrame): Map[Set[String], Cardinality] = {
    def walk(t: JoinTree[Cardinality]): Map[Set[String], Cardinality] =
      t match {
        case s: ScanNode[Cardinality] => Map(s.tableSet -> s.annotation)
        case j @ JoinNode(o, i, a) =>
          walk(o) ++ walk(i) + (j.tableSet -> a)
      }
    QueryPlanOps(df).joinTree.map(walk).getOrElse(Map.empty)
      .filter(_._2.isValid)
  }

  /** Execute `sql` natively (first pass), then re-optimize it through a
    * textbook DP pipeline whose cardinalities are the harvested actuals
    * (estimator `fallback` off the observed path). Returns the
    * re-optimized DataFrame; the first pass is fully materialized to
    * populate its metrics.
    */
  def reoptimize(spark: SparkSession, sql: String,
      stats: EmulatedStatistics,
      fallback: CardinalityEstimator = new BasicCardinalityEstimator)
      : DataFrame = {
    val first = spark.sql(sql)
    // execute THIS plan instance: a write (or .count) would wrap the query
    // in a fresh QueryExecution and leave first's SQLMetrics at zero;
    // toRdd.count() runs the inspected executedPlan without materializing
    // rows on the driver
    first.queryExecution.toRdd.count()
    val observed = harvest(first)
    val pipeline = new TextBookOptimizationPipeline(spark,
      new DynamicProgrammingEnumerator(),
      new CoutCostModel,
      new PreComputedCardinalities(observed, fallback),
      stats = stats)
    pipeline.optimize(sql)
  }
}
