package graft
import org.apache.spark.sql.SparkSession
object DebugTmp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    for (name <- Seq("q01_pricing_summary", "q02_flagship_spj", "q03_topk_revenue", "s01_ann_topk")) {
      val df = SparkEntry.queries(name)(spark, dir)
      println(s"===== $name =====")
      val plan = df.queryExecution.executedPlan.toString
      // print condensed: node names + pushed filters lines
      plan.linesIterator.filter(l =>
        l.contains("Scan parquet") || l.contains("PushedFilters") ||
        l.contains("Join") || l.contains("Exchange") || l.contains("HashAggregate") ||
        l.contains("TakeOrdered") || l.contains("Sort ") || l.contains("Window") ||
        l.contains("ReadSchema")).take(30).foreach(l => println(l.take(200)))
    }
    spark.stop()
  }
}
