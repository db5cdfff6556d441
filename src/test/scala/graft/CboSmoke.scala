package graft

import org.apache.spark.sql.SparkSession

/** Smoke for the bench's native_cbo estimator path — external catalog
  * tables over the fixture parquet FILES + ANALYZE FOR ALL COLUMNS +
  * CBO fragment estimates with temp views dropped:
  * `sbt "Test/runMain graft.CboSmoke [sfDir]"`. Fails loudly if any
  * step (file-location table, ANALYZE, resolution, stats propagation)
  * breaks, so a 30-minute bench run never discovers it first.
  */
object CboSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.registerAll(spark, sfDir)
    val stats = OptQueries.statsFor(spark, sfDir)
    val tpch = Seq("region", "nation", "customer", "supplier",
      "part", "orders", "lineitem")
    tpch.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t USING parquet LOCATION '$sfDir/$t.parquet'")
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    tpch.foreach(spark.catalog.dropTempView(_))
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val sql = """SELECT count(*) AS n FROM customer, orders, lineitem, nation
                   WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
                     AND c_nationkey = n_nationkey AND o_totalprice > 100000"""
      val nativeStats = new graft.stats.NativeStatistics(spark)
      val b = graft.qal.QueryFacade(spark, sql).joinBlock.get
      val g = new graft.opt.JoinGraph(b, stats)
      val est = nativeStats.rowEstimate(
        graft.opt.QueryFragment.fragmentPlan(g, g.tables.toSet))
      val actual = spark.sql(sql).head().getLong(0)
      println(s"cbo estimate = $est, actual = $actual")
      require(est.isDefined, "no CBO estimate produced")
      require(est.get > BigInt(0), s"degenerate estimate $est")
      // the size-based guess without stats is off by many orders of
      // magnitude; a working CBO estimate lands within 100x here
      val ratio = est.get.toDouble / math.max(actual, 1L)
      require(ratio < 100 && ratio > 0.01,
        s"estimate $est vs actual $actual — CBO stats not flowing")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      tpch.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      Tables.registerAll(spark, sfDir)
    }
    println("CboSmoke OK")
    spark.stop()
  }
}
