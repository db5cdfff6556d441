package graft

import org.apache.spark.sql.functions._
import graft.opt.Salting

/** Plan-quality invariants: predicate pushdown and column pruning must
  * reach the parquet scan (the "PushedFilters / ReadSchema" bar from the
  * build brief), and salting must preserve join/aggregation semantics.
  */
class PushdownAndSaltingSpec extends SparkSpec {

  test("runtime bloom filter prunes the fact side of a selective dim join") {
    // Spark injects a bloom filter built from the filtered (creation) side
    // into the big (application) side's scan stage — row-level semi-join
    // pruning BEFORE the shuffle, the lever that cuts fact-side shuffle
    // bytes at 100 TB when partition pruning can't apply. Size thresholds
    // default to cluster scale; lower them to exercise the rule on test SF.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val l = Tables.load(spark, sfDir, "lineitem")
      val s = Tables.load(spark, sfDir, "supplier")
        .filter(org.apache.spark.sql.functions.col("s_nationkey") === 3)
      val joined = l.join(s,
        org.apache.spark.sql.functions.col("l_suppkey") ===
          org.apache.spark.sql.functions.col("s_suppkey"))
        .groupBy("s_suppkey")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter") ||
        optimized.contains("BloomFilter"), optimized.take(2000))
      // pruning must not change answers
      val plain = l.join(Tables.load(spark, sfDir, "supplier")
          .filter(org.apache.spark.sql.functions.col("s_nationkey") === 3),
        org.apache.spark.sql.functions.col("l_suppkey") ===
          org.apache.spark.sql.functions.col("s_suppkey"))
      assert(joined.selectExpr("sum(n)").collect().head.getLong(0) ===
        plain.count())
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("filters and projections reach the parquet scan") {
    val df = Relational.queries("q06_filter_agg")(spark, sfDir)
    val scan = df.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    // filter pushed into the parquet reader
    assert(scan.metadata("PushedFilters").contains("l_shipdate"),
      scan.metadata("PushedFilters"))
    // only referenced columns are read
    val readCols = scan.schema.fieldNames.toSet
    assert(readCols.subsetOf(Set("l_shipdate", "l_discount", "l_quantity",
      "l_extendedprice")), readCols.toString)
    assert(!readCols.contains("l_orderkey"))
  }

  test("scans of a projected query prune to the referenced columns") {
    val df = Tables.load(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    val scan = df.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    assert(scan.schema.fieldNames.toSeq === Seq("l_returnflag"))
  }

  test("salted equi-join equals the plain join") {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_suppkey").as("k"), col("l_quantity"))
    val su = Tables.load(spark, sfDir, "supplier")
      .select(col("s_suppkey").as("k"), col("s_name"))
    val plain = li.join(su, "k").groupBy(col("s_name"))
      .agg(round(sum(col("l_quantity")), 2).as("q"))
    val salted = Salting.saltedEquiJoin(li, su, "k", factor = 8)
      .groupBy(col("s_name")).agg(round(sum(col("l_quantity")), 2).as("q"))
    assert(sameResults(salted, plain))
  }

  test("salted join rejects right/full outer (replicated small side)") {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_suppkey").as("k"))
    val su = Tables.load(spark, sfDir, "supplier")
      .select(col("s_suppkey").as("k"))
    intercept[IllegalArgumentException] {
      Salting.saltedEquiJoin(li, su, "k", factor = 4, joinType = "full_outer")
    }
    intercept[IllegalArgumentException] {
      Salting.saltedEquiJoin(li, su, "k", factor = 4, joinType = "right")
    }
    // left outer stays legal: unmatched rows come from the unreplicated side
    assert(Salting.saltedEquiJoin(li, su, "k", factor = 4,
      joinType = "left").count() === li.count())
  }

  test("salted two-phase count equals plain count") {
    val ev = Tables.load(spark, sfDir, "events")
    val plain = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val salted = Salting.saltedCount(ev, "event_type", factor = 16)
    assert(sameResults(salted, plain))
  }
}
