package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import graft.sources.Bucketing

/** Bucketing = pay the shuffle once at write time: equal-bucket-count
  * tables joined on their bucket key must plan WITHOUT shuffle exchanges
  * under the join, and per-bucket sortBy removes the sort too.
  */
class BucketingSpec extends SparkSpec {

  private def withConf[T](kvs: (String, String)*)(body: => T): T = {
    val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed co-located join plans without shuffles or sorts") {
    val o = Tables.load(spark, sfDir, "orders")
    val l = Tables.load(spark, sfDir, "lineitem")
    Bucketing.writeBucketed(o, "orders_bkt", "o_orderkey", 8)
    Bucketing.writeBucketed(l, "lineitem_bkt", "l_orderkey", 8)
    try withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = spark.table("orders_bkt")
        .join(spark.table("lineitem_bkt"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("l_quantity"), col("o_totalprice"))
      val smj = joined.queryExecution.executedPlan.collectFirst {
        case j: SortMergeJoinExec => j
      }.get
      // co-located: nothing below the join moves data or re-sorts
      assert(Bucketing.shuffleExchanges(smj).isEmpty,
        smj.toString.linesIterator.take(8).mkString("\n"))
      assert(Bucketing.isShuffleFree(joined))
      // same answers as the unbucketed join
      val plain = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("l_quantity"), col("o_totalprice"))
      assert(sameResults(joined, plain))
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    }
  }

  test("aggregation on the bucket key needs no exchange") {
    val o = Tables.load(spark, sfDir, "orders")
    Bucketing.writeBucketed(o, "orders_bkt2", "o_orderkey", 8)
    try {
      val agg = spark.table("orders_bkt2").groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      assert(Bucketing.isShuffleFree(agg), agg.queryExecution.executedPlan.toString
        .linesIterator.take(8).mkString("\n"))
      assert(agg.count() === o.count())
    } finally spark.sql("DROP TABLE IF EXISTS orders_bkt2")
  }
}
