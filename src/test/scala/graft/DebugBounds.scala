package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: per-join UES bound vs executed actual for named JOB
  * kit queries — `sbt "Test/runMain graft.DebugBounds <sfDir> <q>..."`.
  * This is how the r11 tail was localized: the q09 blow-up is entirely
  * the final two-edge lineitem step (the intermediate's (order,
  * supplier) combos almost never co-occur in lineitem — semijoin
  * selectivity, invisible to any single-relation statistic), and the
  * q03/q04 chain losses accumulate at the filtered-dimension joins.
  */
object DebugBounds {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    Tables.registerAll(spark, sfDir)
    // GRAFT_DEBUG_TIER=bloom|cms|exact routes the probe ladder under test
    val pipeline = graft.opt.Presets.ues(spark,
      OptQueries.statsFor(spark, sfDir),
      sketchTier = sys.env.getOrElse("GRAFT_DEBUG_TIER", "exact"))
    def cards(t: graft.plans.JoinTree[graft.core.Cardinality]): Seq[(Set[String], Double)] =
      t match {
        case graft.plans.JoinNode(o, i, a) =>
          cards(o) ++ cards(i) :+ ((t.tableSet, a.value))
        case _ => Seq.empty
      }
    def acts(t: graft.plans.JoinTree[graft.core.Cardinality]): Seq[Double] =
      t match {
        case graft.plans.JoinNode(o, i, a) => acts(o) ++ acts(i) :+ a.value
        case _ => Seq.empty
      }
    for (q <- args.drop(1)) {
      // named queries resolve across the kit directories (job first)
      val path = Seq("job", "stats", "ssb", "stack")
        .map(d => java.nio.file.Paths.get(s"/root/repo/workloads/$d/$q.sql"))
        .find(java.nio.file.Files.exists(_))
        .getOrElse(throw new IllegalArgumentException(s"no kit file for $q"))
      val sql = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
      val res = pipeline.optimizeQuery(sql)
      res.df.collect()
      val est = res.joinOrder.map(cards).getOrElse(Seq.empty)
      val act = graft.plans.QueryPlanOps(res.df).joinTree.map(acts)
        .getOrElse(Seq.empty)
      println(s"== $q")
      est.zip(act).foreach { case ((ts, e), a) =>
        println(f"  ${ts.toSeq.sorted.mkString("+")}%-70s est=$e%14.0f act=$a%12.0f q=${math.max(e / math.max(a, 1), math.max(a, 1) / math.max(e, 1))}%10.1f")
      }
    }
    spark.stop()
  }
}
