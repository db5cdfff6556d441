package graft

import org.apache.spark.sql.functions._
import graft.functions.RhpBuckets

/** Pins the fused RhpBuckets expression against the formulation it
  * replaced: one aggregate(zip_with(v, plane)) higher-order call per
  * plane with sign bits packed per band. The native expression must be
  * bit-identical (same sequential accumulation order, same `dot > 0`
  * sign rule, same little-endian packing) in BOTH evaluation modes —
  * interpreted eval and whole-stage codegen.
  */
class RhpBucketsSpec extends SparkSpec {

  private def planes(n: Int, d: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(n, d)(rnd.nextGaussian())
  }

  private def hofBuckets(ps: Array[Array[Double]], rowsPerBand: Int) = {
    val numBands = ps.length / rowsPerBand
    (0 until numBands).map { b =>
      val bucket = (0 until rowsPerBand).map { r =>
        val p = ps(b * rowsPerBand + r)
        val dot = expr(s"aggregate(zip_with(_v, array(${p.mkString(",")})," +
          " (x, y) -> x * y), 0D, (acc, q) -> acc + q)")
        when(dot > 0, lit(1L << r)).otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_))
      bucket
    }
  }

  test("native buckets equal the per-plane HOF formulation bit for bit") {
    import spark.implicits._
    val d = 16
    val ps = planes(24, d, seed = 11L) // 6 bands x 4 rows
    val rnd = new java.util.Random(5L)
    val vecs = (1 to 200).map(i => (i.toLong, Seq.fill(d)(rnd.nextGaussian())))
    val df = vecs.toDF("id", "v").withColumn("_v", col("v"))
    val native = df.select(col("id"),
      RhpBuckets.rhpBuckets(col("v"), ps, rowsPerBand = 4).as("bk"))
    val hof = df.select(col("id"), array(hofBuckets(ps, 4): _*).as("bk"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
    // and interpreted eval agrees with codegen: evaluate the expression
    // directly off-plan via a local relation round trip
    val collected = native.orderBy("id").collect().map(_.getSeq[Long](1))
    val viaEval = vecs.sortBy(_._1).map { case (_, v) =>
      functions.RhpBuckets(
        org.apache.spark.sql.catalyst.expressions.Literal.create(v.toArray,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)), ps, 4)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
    }
    assert(collected.map(_.toSeq).toSeq === viaEval)
  }

  test("word bucket counts equal the per-bucket filter(split(...)) " +
      "formulation, including repeated spaces and empty strings") {
    import spark.implicits._
    val texts = Seq("the quick brown fox", "a  b   c", "", "   ",
      "Zebra yak xylophone!", "1 22 333 4444", "single")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "chunk_text")
    val hof = df.select(col("id"), array((0 until 8).map(b =>
      size(expr("filter(split(chunk_text, ' '), w -> w != '' and " +
        s"ascii(substring(w, 1, 1)) % 8 = $b)")).cast("float")): _*).as("f"))
    val native = df.select(col("id"), graft.functions.WordBucketCounts
      .wordBucketCounts(col("chunk_text"), 8).as("f"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
  }

  test("dimension mismatch reproduces zip_with null semantics: bit 0") {
    import spark.implicits._
    val ps = planes(4, 8, seed = 3L)
    val df = Seq((1L, Seq(1.0, 2.0, 3.0))).toDF("id", "v") // dim 3 != 8
    val r = df.select(RhpBuckets.rhpBuckets(col("v"), ps, 2).as("bk"))
      .head().getSeq[Long](0)
    assert(r === Seq(0L, 0L))
  }
}
