package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: print the executed physical plan (with SQLMetric
  * actuals) and the reconstructed join tree for a named JOB kit query —
  * `sbt "Test/runMain graft.DebugPlan <sfDir> <q>"`. Used to audit the
  * per-node actual-cardinality attribution that feeds KitActuals.
  */
object DebugPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    Tables.registerAll(spark, sfDir)
    val pipeline = graft.opt.Presets.ues(spark, OptQueries.statsFor(spark, sfDir))
    for (q <- args.drop(1)) {
      val sql = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"/root/repo/workloads/job/$q.sql")), "UTF-8")
      val res = pipeline.optimizeQuery(sql)
      res.df.collect()
      println(s"== $q executed plan")
      val ep = res.df.queryExecution.executedPlan
      println(ep.toString.take(12000))
      println("== metrics per join operator")
      ep.foreach { op =>
        if (op.nodeName.toLowerCase.contains("join"))
          println(f"${op.nodeName}%-40s rows=${op.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)}%12d  ${op.simpleStringWithNodeId().take(160)}")
      }
      println("== reconstructed joinTree")
      graft.plans.QueryPlanOps(res.df).joinTree.foreach { t =>
        def walk(n: graft.plans.JoinTree[graft.core.Cardinality]): Unit = n match {
          case graft.plans.JoinNode(o, i, a) =>
            walk(o); walk(i)
            println(f"  ${n.tableSet.toSeq.sorted.mkString(",")}%-70s act=${a.value}%14.0f")
          case _ =>
        }
        walk(t)
      }
    }
    spark.stop()
  }
}
