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
    // corpus-table window (the stats kit runs entirely on events/
    // documents/embeddings): explicit scalar column lists — FOR ALL
    // COLUMNS would abort on the array embedding column — and the
    // nanos-as-long conf so a nanos-vintage events file never aborts
    // catalog schema inference. Mirrors Bench's analyzeCols exactly.
    val corpus = Seq(
      "events" -> Seq("event_id", "user_id", "event_type", "value"),
      "documents" -> Seq("doc_id", "lang", "source", "n_chars"),
      "embeddings" -> Seq("vec_id", "label"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    corpus.foreach { case (t, cols) =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t USING parquet LOCATION '$sfDir/$t.parquet'")
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS " +
        s"FOR COLUMNS ${cols.mkString(", ")}")
    }
    corpus.foreach(c => spark.catalog.dropTempView(c._1))
    try {
      val snap = graft.opt.CatalogSystemR.capture(spark, corpus.map(_._1))
      require(snap.keySet == corpus.map(_._1).toSet,
        s"corpus capture incomplete: ${snap.keySet}")
      require(snap("events").ndv.contains("user_id"),
        "events.user_id ndv missing from the catalog snapshot")
      Tables.registerAll(spark, sfDir)
      val sysR = new graft.opt.CatalogSystemR(snap)
      // a stats-kit-shaped self-join: genuine System-R estimate expected
      val sql2 = """SELECT p.user_id FROM events p, events e
                    WHERE p.user_id = e.user_id
                      AND p.event_type = 'purchase' AND e.event_type = 'error'"""
      val b2 = graft.qal.QueryFacade(spark, sql2).joinBlock.get
      val g2 = new graft.opt.JoinGraph(b2, stats)
      val est2 = sysR.estimate(g2, g2.tables.toSet)
      val actual2 = spark.sql(s"SELECT count(*) FROM ($sql2)").head().getLong(0)
      println(s"corpus System-R estimate = $est2, actual = $actual2")
      require(est2.isDefined, "System-R fell back on ANALYZE'd corpus tables")
      require(est2.get >= 1.0, s"degenerate corpus estimate $est2")
    } finally {
      corpus.foreach(c => spark.sql(s"DROP TABLE IF EXISTS ${c._1}"))
      Tables.registerAll(spark, sfDir)
    }
    println("CboSmoke OK")
    spark.stop()
  }
}
