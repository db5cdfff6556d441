package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Embedding-space clustering for corpus curation: the semantic-cluster
  * step that cluster-balanced sampling, SemDeDup-style pruning, and
  * topic-mixture reporting all start from.
  *
  * Reference analog: PostBOUND's toolkit has no clustering (it is a query
  * optimizer), but its experiment harness's deterministic, repeatable runs
  * (`/root/reference/postbound/experiments/runner.py`) set the bar this
  * module meets for data pipelines: the SAME corpus must always produce
  * the SAME clusters, on any cluster size, any partitioning, any engine.
  *
  * Hence fixed-point Lloyd's: embeddings quantize to BIGINT units of
  * `1/scale` via `floor(x * scale)` (scale a power of two, so the
  * multiply is EXACT in IEEE arithmetic — only the exponent moves), and
  * every distance and centroid sum is integer. Integer sums are
  * associative, so partial aggregation order — the one thing Spark does
  * not promise — cannot change a single bit of the result, and a serial
  * DuckDB oracle can replay the rounds exactly.
  *
  * Scale design (the Spark MLlib k-means shape, made bit-reproducible):
  *   - centroids live on the DRIVER (k x dim BIGINTs — a few KB) and
  *     broadcast into the assignment expression as literals, so
  *     assignment is a narrow map-side pass over the corpus: no join, no
  *     shuffle, whole-stage codegen.
  *   - each update round is ONE shuffle of (cid, dim) partial sums
  *     (map-side combine makes the shuffle k x dim rows per task, not
  *     |corpus| rows).
  *   - rounds collect k x dim aggregated rows back to the driver —
  *     bounded by k and dim, never by corpus size.
  */
object Clustering {

  /** Quantized copy of the vector column: BIGINT units of 1/scale. */
  private def quantize(df: DataFrame, vecCol: String, scale: Long) =
    df.withColumn("qv",
      transform(col(vecCol), x => floor(x.cast("double") * scale).cast("long")))

  /** One map-side assignment pass: cluster id (1-based, matching the
    * oracle's row_number) of the nearest centroid by squared L2 distance,
    * ties to the smallest cid. `array_min` over (dist, cid) structs
    * orders lexicographically — exactly the oracle's
    * `ORDER BY dist, cid LIMIT 1` — and stays inside codegen.
    */
  private def assignExpr(centroids: Array[Array[Long]]) = {
    val cands = centroids.zipWithIndex.map { case (c, j) =>
      val lits = array(c.map(lit): _*)
      // fused native integer distance (overflow throws, matching the
      // ANSI column-arithmetic fold it replaces)
      val d = graft.functions.SquaredL2.squaredL2Long(col("qv"), lits)
      struct(d.as("dist"), lit(j + 1L).as("cid"))
    }
    array_min(array(cands: _*))
  }

  /** Fixed-point Lloyd's k-means. Initial centroids are the `k` vectors
    * with the smallest ids (deterministic, oracle-replayable); `iters`
    * rounds of assign + integer centroid update (`floor(sum/count)` —
    * IEEE double division of < 2^53 integers, identical on every
    * engine); empty clusters keep their previous centroid. Returns the
    * final assignment `(idCol, cluster_id, sq_dist)` under the last
    * centroids — a narrow, shuffle-free pass.
    */
  def kmeansFixedPoint(embs: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, scale: Long = 65536L): DataFrame =
    assignWithCentroids(embs, idCol, vecCol,
      kmeansCentroids(embs, idCol, vecCol, k, iters, scale), scale)

  /** Assignment under FIXED centroids — the serving-time pass: quantize,
    * nearest centroid by squared L2 (ties to smallest cid), all from
    * broadcast literals, so the plan is narrow (no join, no shuffle).
    * Output `(idCol, cluster_id, sq_dist)`.
    */
  def assignWithCentroids(embs: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Long]], scale: Long = 65536L): DataFrame =
    quantize(embs.select(col(idCol).cast("bigint").as("id"), col(vecCol)),
        vecCol, scale)
      .withColumn("a", assignExpr(centroids))
      .select(col("id").as(idCol), col("a.cid").as("cluster_id"),
        col("a.dist").as("sq_dist"))

  /** Persistable form of a trained centroid set: (cid, centroid). */
  def centroidsDf(spark: SparkSession,
      centroids: Array[Array[Long]]): DataFrame = {
    import spark.implicits._
    centroids.zipWithIndex
      .map { case (c, j) => (j + 1L, c.toSeq) }.toSeq
      .toDF("cid", "centroid")
  }

  /** Read back what [[centroidsDf]] wrote (cid is 1-based and dense). */
  def collectCentroids(df: DataFrame): Array[Array[Long]] =
    df.orderBy(col("cid")).collect()
      .map((r: Row) => r.getSeq[Long](1).toArray)

  /** Train and return the final centroids themselves (same rounds as
    * [[kmeansFixedPoint]]) — the artifact a serving path persists. */
  def kmeansCentroids(embs: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, scale: Long = 65536L): Array[Array[Long]] = {
    require(k > 0 && iters >= 0)
    require((scale & (scale - 1)) == 0L, "scale must be a power of two")
    // loop invariant in the slim bounded cache: every Lloyd round (and a
    // repeated training call over the same corpus) reads the quantized
    // blocks instead of paying an eager checkpoint per invocation
    val q = Dedup.scopedCacheSlim(quantize(
      embs.select(col(idCol).cast("bigint").as("id"), col(vecCol)),
      vecCol, scale).select(col("id"), col("qv")))
    var centroids: Array[Array[Long]] = q.orderBy(col("id")).limit(k)
      .collect().map(_.getSeq[Long](1).toArray)
    require(centroids.length == k, s"corpus smaller than k=$k")
    for (_ <- 0 until iters) {
      val assigned = q.withColumn("a", assignExpr(centroids))
        .select(col("id"), col("a.cid").as("cid"), col("qv"))
      val sums = assigned
        .select(col("cid"), posexplode(col("qv")).as(Seq("d", "v")))
        .groupBy("cid", "d")
        .agg(sum("v").as("sv"), count(lit(1)).as("cnt"))
        .collect()
      val next = centroids.map(_.clone())
      sums.foreach { r =>
        val cid = r.getLong(0).toInt - 1
        val d = r.getInt(1)
        next(cid)(d) =
          math.floor(r.getLong(2).toDouble / r.getLong(3).toDouble).toLong
      }
      centroids = next
    }
    centroids
  }

  /** DuckDB oracle for [[kmeansFixedPoint]] over the `embeddings` table:
    * the same rounds unrolled serially as a CTE chain — quantize, seed
    * from the k smallest ids, then per round an assignment
    * (row_number over (dist, cid)) and an integer centroid update with
    * empty-cluster carry-over. Generated here so gate and engine can
    * never drift on round count or constants.
    */
  /** The shared Lloyd CTE chain (no `WITH` keyword): quantize, seed from
    * the k smallest ids, then per round an assignment (row_number over
    * (dist, cid)) and an integer centroid update with empty-cluster
    * carry-over. Ends at CTE `c<iters>` — the final centroids. */
  private def kmeansCtes(k: Int, iters: Int, scale: Long): String = {
    val rounds = (1 to iters).map { r =>
      s"""a$r AS (
         SELECT id, cid FROM (
           SELECT q.id, c.cid,
             row_number() OVER (PARTITION BY q.id
               ORDER BY sum((q.v - c.cv) * (q.v - c.cv)), c.cid) AS rk
           FROM q JOIN c${r - 1} c ON q.d = c.d
           GROUP BY q.id, c.cid) WHERE rk = 1),
       c$r AS (
         SELECT p.cid, p.d,
           coalesce(CAST(floor(CAST(u.sv AS DOUBLE) / CAST(u.cnt AS DOUBLE))
                         AS BIGINT), p.cv) AS cv
         FROM c${r - 1} p LEFT JOIN (
           SELECT a.cid, q.d, CAST(sum(q.v) AS BIGINT) AS sv,
                  count(*) AS cnt
           FROM a$r a JOIN q ON q.id = a.id
           GROUP BY a.cid, q.d) u
         ON p.cid = u.cid AND p.d = u.d)"""
    }.mkString(",\n")
    s"""q AS (
         SELECT vec_id AS id,
           generate_subscripts(embedding, 1) - 1 AS d,
           unnest(list_transform(embedding::DOUBLE[],
             x -> CAST(floor(x * $scale.0) AS BIGINT))) AS v
         FROM embeddings),
       seeds AS (
         SELECT id, CAST(row_number() OVER (ORDER BY id) AS BIGINT) AS cid
         FROM (SELECT DISTINCT id FROM q) ORDER BY id LIMIT $k),
       c0 AS (SELECT s.cid, q.d, q.v AS cv
              FROM seeds s JOIN q ON q.id = s.id),
       $rounds"""
  }

  /** Final-assignment subquery under the last centroids `c<iters>`:
    * (id, cid, sq_dist) with rk = 1. */
  private def finalAssign(iters: Int): String =
    s"""SELECT id, cid, sq_dist FROM (
         SELECT q.id, c.cid,
           CAST(sum((q.v - c.cv) * (q.v - c.cv)) AS BIGINT) AS sq_dist,
           row_number() OVER (PARTITION BY q.id
             ORDER BY sum((q.v - c.cv) * (q.v - c.cv)), c.cid) AS rk
         FROM q JOIN c$iters c ON q.d = c.d
         GROUP BY q.id, c.cid) WHERE rk = 1"""

  /** DuckDB oracle for [[kmeansFixedPoint]] over the `embeddings` table:
    * the same rounds unrolled serially as a CTE chain. Generated here so
    * gate and engine can never drift on round count or constants.
    */
  def kmeansOracleSql(k: Int, iters: Int, scale: Long = 65536L): String =
    s"""WITH ${kmeansCtes(k, iters, scale)}
       SELECT id AS vec_id, cid AS cluster_id, sq_dist
       FROM (${finalAssign(iters)})
       ORDER BY vec_id"""

  /** SemDeDup proper (the published recipe): cluster the corpus with
    * fixed-point k-means, generate candidate pairs only WITHIN each
    * cluster (the clusters bound the quadratic blowup — at 100 TB the
    * per-cluster self-join is an equality join on cluster_id over
    * corpus/k-sized groups, never a global cross product), prune every
    * vector whose cosine to a smaller-id same-cluster vector is >=
    * `threshold` ([[Similarity.semDedupPrune]] keep-first semantics).
    * The whole pipeline is deterministic: integer Lloyd rounds + the
    * fused-loop [[graft.functions.CosineSimilarity]] on the raw floats.
    * Output: (idCol, kept, pruned_by).
    */
  def semDedupKmeans(embs: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, threshold: Double,
      scale: Long = 65536L): DataFrame = {
    import graft.functions.CosineSimilarity.cosineSim
    val cents = kmeansCentroids(embs, idCol, vecCol, k, iters, scale)
    // narrow pass: cluster id from broadcast literals, no join
    val t = quantize(
        embs.select(col(idCol).cast("bigint").as("id"),
          col(vecCol).cast("array<double>").as("v")), "v", scale)
      .withColumn("cid", assignExpr(cents).getField("cid"))
      .select(col("id"), col("v"), col("cid"))
    val a = t.select(col("cid"), col("id").as("a_id"), col("v").as("va"))
    val b = t.select(col("cid"), col("id").as("b_id"), col("v").as("vb"))
    val pairs = a.hint("shuffle_hash").join(b,
        a("cid") === b("cid") && col("a_id") < col("b_id"))
      .filter(cosineSim(col("va"), col("vb")) >= threshold)
      .select(col("a_id"), col("b_id"))
    Similarity.semDedupPrune(embs, pairs, idCol)
  }

  /** DuckDB oracle for [[semDedupKmeans]]: the Lloyd CTE chain, the
    * final assignment, the same within-cluster pair predicate on the
    * raw float vectors, and s07's prune rule. */
  def semDedupKmeansOracleSql(k: Int, iters: Int, threshold: Double,
      scale: Long = 65536L): String =
    s"""WITH ${kmeansCtes(k, iters, scale)},
       asg AS (${finalAssign(iters)}),
       e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       t AS (SELECT e.vec_id, e.v, asg.cid
             FROM e JOIN asg ON e.vec_id = asg.id),
       pairs AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id
                 FROM t a JOIN t b
                   ON a.cid = b.cid AND a.vec_id < b.vec_id
                 WHERE list_cosine_similarity(a.v, b.v) >= $threshold),
       pr AS (SELECT b_id AS vec_id, min(a_id) AS first_pruner
              FROM pairs GROUP BY 1)
       SELECT e.vec_id, pr.vec_id IS NULL AS kept,
              CAST(coalesce(pr.first_pruner, -1) AS BIGINT) AS pruned_by
       FROM e LEFT JOIN pr ON e.vec_id = pr.vec_id
       ORDER BY e.vec_id"""
}
