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
      val d = aggregate(
        zip_with(col("qv"), lits, (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x)
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
    val q = quantize(
      embs.select(col(idCol).cast("bigint").as("id"), col(vecCol)),
      vecCol, scale).select(col("id"), col("qv")).localCheckpoint(true)
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
  def kmeansOracleSql(k: Int, iters: Int, scale: Long = 65536L): String = {
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
    s"""WITH q AS (
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
       $rounds
       SELECT id AS vec_id, cid AS cluster_id, sq_dist FROM (
         SELECT q.id, c.cid,
           CAST(sum((q.v - c.cv) * (q.v - c.cv)) AS BIGINT) AS sq_dist,
           row_number() OVER (PARTITION BY q.id
             ORDER BY sum((q.v - c.cv) * (q.v - c.cv)), c.cid) AS rk
         FROM q JOIN c$iters c ON q.d = c.d
         GROUP BY q.id, c.cid) WHERE rk = 1
       ORDER BY vec_id"""
  }
}
