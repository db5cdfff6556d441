package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.RollingHash

/** Train a linear classifier INSIDE the engine: a fixed-round batch
  * perceptron over hashed bag-of-words features — the in-database
  * counterpart of a fastText-style quality/language tagger, and the
  * natural extension of the reference's training toolkit
  * (`/root/reference/postbound/postbound/_stages.py` TrainingSpec/Data)
  * from plan features to corpus features.
  *
  * Determinism is the design driver, as with [[Graphs]] and
  * [[Curation]]: features are integer token counts in
  * `rolling_hash(token) mod dims` buckets (the engine-portable
  * polynomial hash of t04), the margin is a BIGINT dot product, the
  * prediction is sign(score) with sign(0) = -1, and the batch update
  * `w += sum(y * x over misclassified docs)` is an integer sum —
  * associative, so any partitioning produces the same weights, and a
  * serial engine (the DuckDB oracle unrolls the rounds) reproduces
  * them bit for bit. SGD's sequential updates would tie the model to a
  * row visitation order no distributed engine can promise; the batch
  * rule is the one that parallelizes honestly.
  *
  * Full-batch unit steps oscillate near the boundary (that is the
  * price of order-freedom — per-sample perceptron steps would need a
  * row order), so the output also carries the Collins-style AVERAGED
  * model as `weight_sum` = sum of the post-round weight vectors:
  * sign-equivalent to the average, integer-exact, and the variant that
  * actually classifies well (spec-pinned).
  *
  * Scale: the feature relation (doc_id, bucket, x) is built once (one
  * explode + one aggregation) and checkpointed; each round is one
  * bucket-literal scan for scores (weights travel as a broadcast
  * literal — kilobytes, like the PQ codebooks) plus one aggregation of
  * the misclassified docs' features. Driver state is `dims` longs.
  *
  * Output: (bucket, weight, weight_sum) — `dims` rows incl. zeros.
  */
object Perceptron {

  /** `labelCol` must be boolean (true → +1, false → -1). */
  def trainHashedBow(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, dims: Int = 64, rounds: Int = 3): DataFrame = {
    require(dims > 0 && rounds >= 0)
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col(idCol).cast("bigint").as("doc_id"),
      col(textCol).as("text"),
      when(col(labelCol).cast("boolean"), 1L).otherwise(-1L).as("y"))
    val feats = base
      .select(col("doc_id"), col("y"),
        explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .withColumn("bucket",
        pmod(RollingHash.rollingHash(col("tok")), lit(dims.toLong)))
      .groupBy("doc_id", "y", "bucket")
      .agg(count(lit(1)).as("x"))
    // loop invariant: materialized once into the slim bounded cache
    // (every round re-reads it; the eager checkpoint it replaces paid
    // the corpus explode+aggregate on every invocation)
    val featsC = Dedup.scopedCacheSlim(feats)
    val w = Array.fill(dims)(0L)
    val wSum = Array.fill(dims)(0L)
    for (_ <- 0 until rounds) {
      val wLit = w.mkString("array(", "L,", "L)")
      // one pass: score every doc against the literal weights, keep the
      // misclassified ones' (y, bucket, x), aggregate the update
      val upd = featsC
        .withColumn("wx", expr(s"x * element_at($wLit, " +
          "CAST(bucket AS INT) + 1)"))
        .groupBy("doc_id", "y")
        .agg(sum(col("wx")).as("score"),
          collect_list(struct(col("bucket"), col("x"))).as("fx"))
        .filter(when(col("score") > 0, 1L).otherwise(-1L) =!= col("y"))
        .select(col("y"), explode(col("fx")).as("f"))
        .groupBy(col("f.bucket").as("bucket"))
        .agg(sum(col("y") * col("f.x")).as("u"))
        .collect()
      upd.foreach(r => w(r.getLong(0).toInt) += r.getLong(1))
      for (b <- 0 until dims) wSum(b) += w(b)
    }
    w.indices.map(b => (b.toLong, w(b), wSum(b)))
      .toDF("bucket", "weight", "weight_sum")
  }
}
