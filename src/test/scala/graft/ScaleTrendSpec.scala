package graft

import org.apache.spark.sql.functions._
import graft.bench.ScaleTrend

/** Pins the scale-trend slice generator: the factor-x corpus must grow
  * row counts exactly, keep ids unique, and preserve workload character
  * (per-copy duplicate structure, intra-copy cosine geometry) rather
  * than degenerate into an everything-is-a-dup corpus.
  */
class ScaleTrendSpec extends SparkSpec {

  test("slice generation: exact factor-x rows, unique ids, preserved " +
      "structure") {
    val out = java.nio.file.Files.createTempDirectory("graft_scale_spec")
      .toString
    ScaleTrend.generate(spark, sfDir, out, factor = 3)
    assert(new java.io.File(s"$out/_SCALE_OK").exists())

    val base = Tables.load(spark, sfDir, "documents")
    val scaled = spark.read.parquet(s"$out/documents.parquet")
    assert(scaled.count() === base.count() * 3)
    assert(scaled.select("doc_id").distinct().count() === scaled.count())
    // copy 0 is the identity slice: rotation by 0 leaves text unchanged
    val n = base.count()
    val c0 = scaled.filter(col("doc_id") < n).select("doc_id", "text")
    assert(sameResults(c0, base.select("doc_id", "text")))
    // the rotation cipher makes copies textually disjoint but preserves
    // word lengths — so the exact-duplicate RATE scales, not collapses:
    // distinct texts grow by the same factor
    assert(scaled.select("text").distinct().count() ===
      base.select("text").distinct().count() * 3)

    val baseE = Tables.load(spark, sfDir, "embeddings")
    val scaledE = spark.read.parquet(s"$out/embeddings.parquet")
    assert(scaledE.count() === baseE.count() * 3)
    assert(scaledE.select("vec_id").distinct().count() === scaledE.count())
    // sign flips are orthogonal: every copy preserves vector norms
    val norm = expr("round(aggregate(embedding, 0D, (a, x) -> a + " +
      "cast(x as double) * cast(x as double)), 6)")
    val nv = baseE.count()
    val normsBase = baseE.select(col("vec_id"), norm.as("n2"))
    val normsCopy2 = scaledE.filter(col("vec_id") >= nv * 2)
      .select((col("vec_id") - nv * 2).as("vec_id"), norm.as("n2"))
    assert(sameResults(normsCopy2, normsBase))
  }
}
