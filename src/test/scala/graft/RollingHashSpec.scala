package graft

import org.apache.spark.sql.functions._
import graft.functions.RollingHash

class RollingHashSpec extends SparkSpec {

  test("native rolling hash matches the HOF formulation on real docs") {
    val docs = Tables.load(spark, sfDir, "documents")
      .filter(length(col("text")) > 0)
      .withColumn("native", RollingHash.rollingHash(col("text")))
      .withColumn("hof", expr(
        "aggregate(transform(split(text, ''), c -> ascii(c)), " +
          "cast(0 as bigint), (acc, x) -> (acc * 31 + x) % 1000000007)"))
    assert(docs.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("known values and SQL registration") {
    RollingHash.register(spark)
    import spark.implicits._
    // "hi": ((0*31+104)%p)*31+105 = 3329
    val r = spark.sql("SELECT rolling_hash('hi') AS h").head().getLong(0)
    assert(r === 3329L)
    assert(Seq("").toDF("t")
      .select(RollingHash.rollingHash(col("t"))).head().getLong(0) === 0L)
  }
}
