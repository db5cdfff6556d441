package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.sources.Sources

/** Partition layout + pruning (SURVEY §4 "partition pruning — reuse"):
  * filters on the partition column must reach the scan as partition
  * filters (directories skipped at planning), and a join against a
  * filtered dimension must prune partitions at runtime (DPP).
  */
class PartitionPruningSpec extends SparkSpec {

  private lazy val partedDir: String = {
    val dir = Files.createTempDirectory("graft_parted").toFile
    dir.deleteOnExit()
    val o = Tables.load(spark, sfDir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
    Sources.writePartitioned(o, s"$dir/orders_by_year", "o_year")
    s"$dir/orders_by_year"
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec if s.schema.fieldNames.exists(_.startsWith("o_")) => s
    }.head

  test("static pruning: partition filter reaches the scan") {
    val parted = spark.read.parquet(partedDir)
    val one = parted.filter(col("o_year") === 1996)
      .agg(count(lit(1)).as("n"))
    val scan = scanOf(one)
    assert(scan.partitionFilters.nonEmpty, "no partition filters on scan")
    // collect() (not head(), which executes a separate limited plan) so
    // the inspected scan instance is the one that runs
    assert(one.collect()(0).getLong(0) ===
      Tables.load(spark, sfDir, "orders")
        .filter(year(col("o_orderdate")) === 1996).count())
    // the pruned scan actually read fewer files than the layout holds
    val filesRead = scan.metrics("numFiles").value
    val totalFiles = scan.relation.location.inputFiles.length
    assert(filesRead > 0 && filesRead < totalFiles,
      s"read $filesRead of $totalFiles files")
  }

  test("dynamic partition pruning fires for a join on the partition key") {
    val parted = spark.read.parquet(partedDir)
    import spark.implicits._
    // the dim must be a real source relation: a LocalRelation would have
    // its filter constant-folded away before the DPP rule can see it
    val dimDir = Files.createTempDirectory("graft_dim").toFile
    dimDir.deleteOnExit()
    Seq((1996, "pick"), (1997, "skip"), (1998, "skip"))
      .toDF("d_year", "d_tag").write.mode("overwrite")
      .parquet(s"$dimDir/years")
    val dim = spark.read.parquet(s"$dimDir/years")
    val saved = ("spark.sql.optimizer.dynamicPartitionPruning.useStats",
      spark.conf.getOption("spark.sql.optimizer.dynamicPartitionPruning.useStats"))
    spark.conf.set(saved._1, "false") // tiny test data fails the stats
    try {                             // benefit heuristic; force the rule
      val joined = parted.join(dim,
          col("o_year") === col("d_year") && col("d_tag") === "pick")
        .agg(count(lit(1)).as("n"))
      val scan = scanOf(joined)
      val hasDpp = scan.partitionFilters.exists(
        _.toString.toLowerCase.contains("dynamicpruning"))
      assert(hasDpp, s"no DPP in partition filters: ${scan.partitionFilters}")
      assert(joined.head().getLong(0) ===
        Tables.load(spark, sfDir, "orders")
          .filter(year(col("o_orderdate")) === 1996).count())
    } finally saved._2 match {
      case Some(v) => spark.conf.set(saved._1, v)
      case None => spark.conf.unset(saved._1)
    }
  }
}
