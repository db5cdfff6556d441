package graft

import org.apache.spark.sql.functions._
import graft.functions.Udafs

class UdafSpec extends SparkSpec {

  test("geometric mean UDAF matches exp(avg(ln)) and works in SQL") {
    Udafs.registerAll(spark)
    Tables.registerAll(spark, sfDir)
    val viaUdaf = spark.sql(
      "SELECT c_nationkey, geo_mean(c_acctbal) AS g FROM customer " +
      "WHERE c_acctbal > 0 GROUP BY c_nationkey")
    val expected = Tables.load(spark, sfDir, "customer")
      .filter(col("c_acctbal") > 0)
      .groupBy(col("c_nationkey"))
      .agg(exp(avg(log(col("c_acctbal")))).as("g"))
    val got = viaUdaf.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val exp0 = expected.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(got.keySet === exp0.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - exp0(k)) < 1e-6 * math.max(1.0, exp0(k)),
        s"nation $k: $v vs ${exp0(k)}")
    }
  }

  test("top-k UDAF returns at most k sorted distinct keys") {
    Udafs.registerAll(spark)
    Tables.registerAll(spark, sfDir)
    val rows = spark.sql(
      "SELECT o_orderstatus, top5_keys(o_custkey) AS ks FROM orders GROUP BY 1")
      .collect()
    rows.foreach { r =>
      val ks = r.getSeq[Long](1)
      assert(ks.size <= 5)
      assert(ks === ks.sorted)
      assert(ks.distinct.size === ks.size)
    }
  }
}
