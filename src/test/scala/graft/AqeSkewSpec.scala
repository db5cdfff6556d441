package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** AQE skew handling — the runtime complement to manual salting
  * (graft.opt.Salting): a hot join key must be detected from actual
  * shuffle sizes and split across tasks, without changing results.
  */
class AqeSkewSpec extends SparkSpec {

  private def withConf[T](kvs: (String, String)*)(body: => T): T = {
    val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the skewed partition of a hot-key join") {
    import spark.implicits._
    // 90% of the big side shares key 1; dim covers keys 0..999
    val big = spark.range(0, 200000).select(
      when(col("id") % 10 =!= 0, 1L).otherwise(col("id") % 1000).as("k"),
      col("id").as("v"))
    val dim = spark.range(0, 1000).select(col("id").as("k"),
      (col("id") * 2).as("w"))
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.join.preferSortMergeJoin" -> "true") {
      val joined = big.join(dim, "k")
      // execute THIS plan instance (count() would build a separate
      // aggregate plan and leave this one un-run/un-adapted)
      val n = joined.queryExecution.executedPlan.execute().count()
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // the SMJ lives inside an AQE query stage (a leaf to collect());
      // the rendered tree includes stage-internal plans
      assert(plan.toString.contains("SortMergeJoin(skew=true)"),
        s"no skew-split join in:\n${
          plan.toString.linesIterator.take(10).mkString("\n")}")
      // runtime re-planning never changes answers
      withConf("spark.sql.adaptive.enabled" -> "false") {
        assert(n === big.join(dim, "k").count())
      }
    }
  }
}
