package graft.sources

import org.apache.spark.sql.SparkSession

/** Session configuration presets for the scales this library targets.
  * Spark's defaults are sized for mid-2010s clusters (200 shuffle
  * partitions, 10 MB broadcast threshold); at 100 TB with ~1000 executors
  * the settings below are the ones that decide whether a job runs at all.
  * Rationale is documented per key — numbers are starting points meant to
  * be scaled with `clusterCores`, not gospel.
  */
object SparkConfigs {

  /** Runtime-settable knobs (safe to apply on a live session). */
  def runtime(clusterCores: Int): Map[String, String] = Map(
    // AQE re-plans joins/partitions from runtime statistics: converts
    // mis-estimated sort-merge joins into broadcasts, coalesces tiny
    // shuffle partitions, and splits skewed ones — the single biggest
    // lever for plan robustness on data nobody profiled
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    // post-shuffle target size: big enough that tasks amortize their
    // scheduling cost, small enough to fit an executor core's memory share
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "128m",
    // 2-3 waves of tasks per core; AQE coalesces the excess, so erring
    // high costs far less than erring low (stragglers + spills)
    "spark.sql.shuffle.partitions" -> (clusterCores * 3).toString,
    // dimensions regularly exceed Spark's 10 MB default; a missed
    // broadcast is a full shuffle of the fact side
    "spark.sql.autoBroadcastJoinThreshold" -> "64m",
    // building + shipping a 64 MB broadcast across 1000 executors can
    // exceed the 300 s default under load
    "spark.sql.broadcastTimeout" -> "600s")

  /** Builder-time knobs (fixed at session start). */
  def static(): Map[String, String] = Map(
    // one input split per 256 MB of parquet: fewer, fuller map tasks; the
    // vectorized reader saturates a core well above the 128 MB default
    "spark.sql.files.maxPartitionBytes" -> "256m",
    // whole-stage codegen emits one class per stage — long query
    // sequences overflow the 240 MB JIT code cache and silently fall
    // back to interpreted generated code (measured 4x on hot stages)
    "spark.driver.extraJavaOptions" -> "-XX:ReservedCodeCacheSize=512m",
    "spark.executor.extraJavaOptions" -> "-XX:ReservedCodeCacheSize=512m")

  /** Apply the runtime preset to a live session. */
  def applyRuntime(spark: SparkSession, clusterCores: Int): Unit =
    runtime(clusterCores).foreach { case (k, v) => spark.conf.set(k, v) }

  /** All keys, for export next to benchmark results (the reference's
    * describe() reproducibility contract covers settings too). */
  def describe(clusterCores: Int): String =
    (runtime(clusterCores) ++ static()).toSeq.sorted
      .map { case (k, v) => s""""$k":"$v"""" }
      .mkString("{", ",", "}")
}
