package graft.opt

import org.apache.spark.sql.SparkSession
import graft.pipeline.{MultiStageOptimizationPipeline, TextBookOptimizationPipeline}
import graft.stats.EmulatedStatistics

/** Canned pipeline configurations (reference: presets.fetch("ues"|...),
  * /root/reference/postbound/opt/presets.py:56-155).
  */
object Presets {

  /** The flagship UES setup: pessimistic ordering, hash-only operators,
    * bound-derived parameters. `sketchTier = "bloom"` swaps the exact
    * join-sketch probes for one-pass Bloom membership counts — the
    * 100 TB probe path (no distinct-set shuffle join; false positives
    * only loosen the bound, never unsound). */
  def ues(spark: SparkSession,
      stats: EmulatedStatistics = null,
      subqueryBranching: Boolean = false,
      sketchTier: String = "exact",
      useSeeds: Boolean = true,
      budgetFor: () => ProbeBudget = ProbeBudget.default _)
      : MultiStageOptimizationPipeline =
    new MultiStageOptimizationPipeline(spark,
      joinOrder = Some(new UESJoinOrderOptimizer(subqueryBranching,
        sketchTier = sketchTier, budgetFor = budgetFor,
        useSeeds = useSeeds)),
      operators = Some(new UESOperatorSelection),
      parameters = Some(new BoundsParameterGeneration),
      stats = stats)

  /** Native: delegate everything to Catalyst (empty stages -> fallback). */
  def native(spark: SparkSession): MultiStageOptimizationPipeline =
    new MultiStageOptimizationPipeline(spark)

  /** Textbook DP with C_out and System-R estimates. */
  def dynprog(spark: SparkSession, linearOnly: Boolean = false,
      stats: EmulatedStatistics = null): TextBookOptimizationPipeline =
    new TextBookOptimizationPipeline(spark,
      new DynamicProgrammingEnumerator(linearOnly),
      new CoutCostModel, new BasicCardinalityEstimator, stats = stats)
}
