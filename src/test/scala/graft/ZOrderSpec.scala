package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.sources.Sources

/** Z-order layout invariants: the Morton-clustered rewrite preserves
  * content exactly, and parquet footer min/max statistics over the
  * clustered files skip most row groups for a rectangle predicate on the
  * SECOND dimension — the case a 1-D sort cannot serve.
  */
class ZOrderSpec extends SparkSpec {

  private def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect() // SQLMetrics only fill on the executed plan instance
    df.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
    }.get
  }

  test("z-order write survives empty input and all-null cluster columns") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_zempty").toString
    // empty input: undefined bounds must fall back to a plain write
    val empty = Seq.empty[(Long, Long, Double)]
      .toDF("l_orderkey", "l_partkey", "l_extendedprice")
    Sources.writeZOrdered(empty, s"$tmp/empty", "l_orderkey", "l_partkey", 4)
    assert(spark.read.parquet(s"$tmp/empty").count() === 0)
    // all-null cluster column: same fallback, rows preserved
    val nulls = Seq((1L, 2.0), (2L, 3.0)).toDF("l_orderkey", "price")
      .withColumn("l_partkey", lit(null).cast("bigint"))
    Sources.writeZOrdered(nulls, s"$tmp/nulls", "l_orderkey", "l_partkey", 4)
    assert(spark.read.parquet(s"$tmp/nulls").count() === 2)
  }

  test("z-order layout preserves content and skips on the non-sort dimension") {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_extendedprice"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_zorder").toString

    // baseline: classic 1-D sort on l_orderkey, same file count
    li.repartitionByRange(32, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .write.mode("overwrite").parquet(s"$tmp/by_orderkey")
    Sources.writeZOrdered(li, s"$tmp/zorder", "l_orderkey", "l_partkey", 32)

    // a SELECTIVE filter on the SECOND dimension only (~5% of its range):
    // the 1-D layout spreads every partkey range over all files, the
    // Z-layout confines it — skipping resolution is bounded by file
    // granularity, so the filter must be narrower than 1/sqrt(files)
    def q(path: String) = spark.read.parquet(path)
      .filter(col("l_partkey").between(100, 110))
    val zRows = scanRows(q(s"$tmp/zorder"))
    val oneDRows = scanRows(q(s"$tmp/by_orderkey"))
    assert(zRows * 2 < oneDRows,
      s"z-order scan read $zRows rows, 1-D sorted layout read $oneDRows")

    // the rewrite is a pure layout change: content identical
    assert(sameResults(spark.read.parquet(s"$tmp/zorder"), li))

    // and a 2-D rectangle returns the same answer as the original layout
    def rect(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("l_orderkey").between(1000, 2000) &&
        col("l_partkey").between(100, 300))
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
    assert(sameResults(rect(spark.read.parquet(s"$tmp/zorder")), rect(li)))
  }

  test("morton interleave orders by both dimensions") {
    // (0,0) < (1,1) in z-space; a point high in one dim but low in the
    // other stays below a point high in both
    val df = spark.range(1).select(
      Sources.zorderValue(lit(0L), lit(0L)).as("z00"),
      Sources.zorderValue(lit(65535L), lit(0L)).as("zA0"),
      Sources.zorderValue(lit(0L), lit(65535L)).as("z0B"),
      Sources.zorderValue(lit(65535L), lit(65535L)).as("zAB"))
    val r = df.collect().head
    val (z00, za0, z0b, zab) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(z00 === 0L)
    assert(zab === (1L << 32) - 1)          // all 32 bits set
    assert((za0 | z0b) === zab && (za0 & z0b) === 0L) // disjoint bit planes
    assert(z00 < za0 && z00 < z0b && za0 < zab && z0b < zab)
  }
}
