package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Bucketed (hash-clustered) catalog tables: the pay-the-shuffle-once lever
  * for 100 TB joins. Writing a table bucketed+sorted on its join key means
  * every subsequent equi-join or aggregation on that key is co-located —
  * Spark's EnsureRequirements recognizes the bucketing as a satisfied
  * HashPartitioning and plans the join with NO shuffle exchange (and, with
  * sortBy, no re-sort for sort-merge). The reference delegates physical
  * clustering to the target DBMS's indexes; on Spark, bucketing is the
  * native equivalent (SURVEY §2.4 co-located joins).
  *
  * Sizing guidance: pick bucket counts so one bucket of the LARGEST table
  * fits an executor core's working set (~128-512 MB of parquet per bucket),
  * and use the SAME bucket count on every table sharing the join key —
  * mismatched counts force a shuffle of the smaller side (Spark only
  * avoids shuffles for equal counts, or multiples when
  * spark.sql.bucketing.coalesceBucketsInJoin.enabled is set).
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted catalog table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)

  /** All shuffle exchanges in the executed plan (empty = co-located). */
  def shuffleExchanges(plan: SparkPlan): Seq[ShuffleExchangeExec] =
    plan.collect { case e: ShuffleExchangeExec => e }

  /** True when the DataFrame's physical plan contains no shuffle at all. */
  def isShuffleFree(df: DataFrame): Boolean =
    shuffleExchanges(df.queryExecution.executedPlan).isEmpty
}
