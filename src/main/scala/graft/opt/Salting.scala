package graft.opt

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting: replicate the small side `factor` times
  * and scatter the large side's hot keys across the replicas, so one
  * skewed key spreads over `factor` reducers instead of stalling one.
  * This is the manual fallback where AQE's skew-join splitting cannot help
  * (e.g. aggregations keyed on a hot value, or non-shuffle-join operators).
  * Semantics are join-equivalent: every large-side row meets exactly one
  * replica of each matching small-side row.
  */
object Salting {

  /** Equi-join `large ⋈ small` on `key`, salted `factor` ways.
    *
    * Only join types where unmatched *small*-side rows are never emitted
    * are allowed: the small side is replicated `factor` times, so a
    * right/full outer join would emit `factor` duplicate null-extended
    * rows for every unmatched small-side row.
    */
  def saltedEquiJoin(large: DataFrame, small: DataFrame, key: String,
      factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor >= 1)
    val allowed = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedEquiJoin does not support joinType=$joinType: the replicated " +
        "small side would duplicate unmatched rows under right/full outer")
    val l = large.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(factor)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    l.join(s, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Salted aggregation: two-phase groupBy for hot grouping keys. Partial
    * aggregation per (key, salt), then final merge per key — the manual
    * form of map-side partial aggregation when the combiner alone cannot
    * absorb the skew (e.g. count-distinct-style states). `aggs` maps output
    * column -> (partialExpr, mergeExpr-over-partial). */
  def saltedCount(df: DataFrame, key: String, factor: Int): DataFrame = {
    require(factor >= 1)
    df.withColumn("__salt", pmod(hash(monotonically_increasing_id()), lit(factor)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).cast("bigint").as("n"))
  }
}
