package graft

import org.apache.spark.sql.functions._
import graft.operators.Temporal

/** As-of and range join semantics + plan-shape invariants: the composed
  * operators must match the naive (inequality-join) formulation row for
  * row while planning WITHOUT any nested-loop product.
  */
class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asOfJoin picks the latest right row at or before each left ts") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "lts", "tag")
    val right = Seq((1L, 10L, 1.0), (1L, 15L, 2.0), (1L, 30L, 3.0),
      (3L, 1L, 9.0)).toDF("k", "rts", "v")
    val out = Temporal.asOfJoin(left, right, Seq("k"), "lts", "rts", Seq("v"))
      .orderBy("k", "lts")
      .select("k", "lts", "tag", "rts", "v").as[(Long, Long, String, Option[Long], Option[Double])]
      .collect().toSeq
    assert(out == Seq(
      (1L, 10L, "a", Some(10L), Some(1.0)), // equal ts is eligible
      (1L, 20L, "b", Some(15L), Some(2.0)), // latest <= 20, not 30
      (2L, 5L, "c", None, None)))           // no right rows for key 2
  }

  test("asOfJoin tolerance nulls out matches older than the window") {
    val left = Seq((1L, 100L)).toDF("k", "lts")
    val right = Seq((1L, 10L, 7.0)).toDF("k", "rts", "v")
    val out = Temporal.asOfJoin(left, right, Seq("k"), "lts", "rts",
      Seq("v"), tolerance = Some(lit(50L)))
      .select("rts", "v").as[(Option[Long], Option[Double])].collect().toSeq
    assert(out == Seq((None, None)))
    val in = Temporal.asOfJoin(left, right, Seq("k"), "lts", "rts",
      Seq("v"), tolerance = Some(lit(95L)))
      .select("rts", "v").as[(Option[Long], Option[Double])].collect().toSeq
    assert(in == Seq((Some(10L), Some(7.0))))
  }

  test("asOfJoin matches the inequality-join formulation on real data") {
    val ev = Tables.load(spark, sfDir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
    val composed = Temporal.asOfJoin(clicks,
      purchases.withColumnRenamed("p_user", "user_id"),
      Seq("user_id"), "click_ts", "purchase_ts", Seq("purchase_value"))
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("purchase_ts"), col("purchase_value"))
    // naive argmax-per-left-row reference (quadratic; fine at sf0.001)
    val naive = clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("purchase_ts") <= col("click_ts"), "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("click_id")
          .orderBy(col("purchase_ts").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("purchase_ts"), col("purchase_value"))
    assert(sameResults(composed, naive))
    // and it must plan as a window, not a product
    val plan = composed.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("rangeJoinBucketed equals the inequality join, exactly once per pair") {
    val pts = spark.range(0, 500).select((col("id") * 7 % 1000).as("p"),
      col("id").as("pid"))
    // overlapping intervals of varying width, incl. bucket-straddling ones
    val iv = spark.range(0, 40).select(col("id").as("iid"),
      (col("id") * 23 % 900).as("s"),
      (col("id") * 23 % 900 + col("id") % 5 * 60 + 10).as("e"))
    val bucketed = Temporal.rangeJoinBucketed(pts, "p", iv, "s", "e", 64L)
      .select("iid", "pid")
    val naive = iv.join(pts, col("s") <= col("p") && col("p") < col("e"))
      .select("iid", "pid")
    assert(sameResults(bucketed, naive))
    // exactly-once: no duplicate (interval, point) pairs
    assert(bucketed.count() == bucketed.distinct().count())
    // pair generation is an equality join on the bucket — no product node
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(2000))
  }
}
