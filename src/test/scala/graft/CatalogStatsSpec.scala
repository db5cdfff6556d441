package graft

import org.apache.spark.sql.functions._

/** Native statistics mode: catalog tables + ANALYZE + CBO — Catalyst's own
  * cost-based estimates flowing into plan stats (the reference's "native"
  * statistics, SURVEY §4 statistics row). Temp views over parquet carry
  * only size-based estimates; managed catalog tables after
  * ANALYZE ... COMPUTE STATISTICS expose rowCount and per-column ndv.
  */
class CatalogStatsSpec extends SparkSpec {

  test("ANALYZE TABLE feeds rowCount and column stats into Catalyst") {
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      spark.sql("DROP TABLE IF EXISTS nation_cat")
      Tables.load(spark, sfDir, "nation").write
        .mode("overwrite").saveAsTable("nation_cat")
      spark.sql("ANALYZE TABLE nation_cat COMPUTE STATISTICS FOR COLUMNS n_nationkey, n_regionkey")

      val stats = spark.table("nation_cat")
        .queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(25)))

      // column-level ndv reaches the catalog
      val cat = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("nation_cat"))
      val colStats = cat.stats.get.colStats
      assert(colStats("n_nationkey").distinctCount.get === BigInt(25))
      assert(colStats("n_regionkey").distinctCount.get <= BigInt(5))

      // CBO propagates estimates through a filter
      val filtered = spark.table("nation_cat")
        .filter(col("n_regionkey") === 0)
        .queryExecution.optimizedPlan.stats
      assert(filtered.rowCount.isDefined)
      assert(filtered.rowCount.get < BigInt(25))
    } finally {
      spark.sql("DROP TABLE IF EXISTS nation_cat")
      spark.conf.set("spark.sql.cbo.enabled", "false")
    }
  }
}
