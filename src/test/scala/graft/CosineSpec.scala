package graft

import org.apache.spark.sql.functions._
import graft.functions.CosineSimilarity

class CosineSpec extends SparkSpec {

  test("native cosine matches the HOF formulation bit-for-bit") {
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val a = e.select(col("vec_id").as("a"), col("v").as("va"))
    val b = e.select(col("vec_id").as("b"), col("v").as("vb"))
    val pairs = a.join(b, col("a") < col("b")).limit(500)
      .withColumn("native", CosineSimilarity.cosineSim(col("va"), col("vb")))
      .withColumn("hof",
        expr("aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (acc, p) -> acc + p)") /
          sqrt(expr("aggregate(va, 0D, (acc, x) -> acc + x * x)") *
            expr("aggregate(vb, 0D, (acc, x) -> acc + x * x)")))
    assert(pairs.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("cosine of a vector with itself is 1; zero vector yields null") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0)),
      (Array(1.0, 0.0), Array(0.0, 0.0))).toDF("a", "b")
      .withColumn("c", CosineSimilarity.cosineSim(col("a"), col("b")))
    val rows = df.select("c").collect()
    assert(math.abs(rows(0).getDouble(0) - 1.0) < 1e-12)
    assert(rows(1).isNullAt(0))
  }

  test("length-mismatched arrays yield null (both eval paths)") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0)))
      .toDF("a", "b")
      .withColumn("c", CosineSimilarity.cosineSim(col("a"), col("b")))
    assert(df.select("c").head().isNullAt(0))
    // interpreted path too (constant folding happens pre-codegen here)
    CosineSimilarity.register(spark)
    val r = spark.sql(
      "SELECT cosine_similarity(array(1D,2D,3D), array(1D,2D)) AS c")
    assert(r.head().isNullAt(0))
    // and matches the HOF formulation (zip_with pads with null -> null sum)
    val hof = df.withColumn("h",
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, p) -> acc + p)"))
      .select("h").head()
    assert(hof.isNullAt(0))
  }

  test("SQL registration works and codegen path is exercised") {
    CosineSimilarity.register(spark)
    Tables.registerAll(spark, sfDir)
    val n = spark.sql(
      """SELECT count(*) AS n FROM embeddings a JOIN embeddings b
         ON a.vec_id < b.vec_id
         WHERE cosine_similarity(a.embedding, b.embedding) > 0.3""")
      .head().getLong(0)
    assert(n >= 0) // exercised without codegen fallback errors
  }
}
