package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale design: the query set is assumed small (broadcast side); the corpus
  * is the distributed side. Brute force is one broadcast-nested-loop join +
  * a per-query top-k (shuffle keyed by query id — perfectly parallel, no
  * skew because every query has the same candidate count). The LSH variant
  * prunes the candidate set with random-hyperplane signatures so the join is
  * an equality join on (band, bucket) instead of a cross product — that is
  * the 100 TB path (cross product is O(corpus x queries); bucketed join is
  * O(collisions)).
  */
object Similarity {

  import graft.functions.CosineSimilarity.cosineSim

  /** Two-phase distributed top-k per query over a scored relation
    * (query_id, neighbor_id, sim): the bounded [[graft.functions.Udafs
    * .TopKByScore]] aggregator keeps a k-row buffer, so each map task emits
    * a local top-k sketch and the shuffle only merges k-row sketches —
    * unlike `row_number().over(partitionBy(query_id))`, which funnels a
    * query's ENTIRE candidate set through one reducer task for the sort
    * (the 100 TB killer: one task per query sorting the whole corpus).
    * Output: (query_id, rnk, neighbor_id, cos_sim) with rank by
    * (sim desc, neighbor_id asc), cos rounded to 4 places after ranking.
    */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new graft.functions.Udafs.TopKByScore(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
    scored.groupBy("query_id")
      .agg(topk(col("sim"), col("neighbor_id")).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "sn")))
      .select(col("query_id"), (col("pos") + 1).as("rnk"),
        col("sn._2").as("neighbor_id"), round(col("sn._1"), 4).as("cos_sim"))
  }

  /** Exact cosine top-k: for each query vector, the k nearest corpus vectors
    * (self-matches excluded). Cosine is the native fused-loop Catalyst
    * expression (graft.functions.CosineSimilarity), so the hot inner loop
    * is whole-stage-codegen'd Java, not interpreted lambdas; ranking is the
    * two-phase bounded top-k (see [[topKPerQuery]]), not a global window.
    * Output: (query_id, rnk, neighbor_id, cos_sim).
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    // cast float->double per ROW here: left to cosineSim's implicit cast
    // it would re-allocate both arrays per scored PAIR (measured 3x on
    // the d05 triangle join; same economics in every scorer below)
    val c = corpus.select(col(idCol).cast("bigint").as("neighbor_id"),
      col(vecCol).cast("array<double>").as("vc"))
    val q = queries.select(col(idCol).cast("bigint").as("query_id"),
      col(vecCol).cast("array<double>").as("vq"))
    topKPerQuery(
      c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
        .withColumn("sim", cosineSim(col("vq"), col("vc")))
        .select("query_id", "neighbor_id", "sim"), k)
  }

  /** Exact k-nearest-neighbor GRAPH of an embedding corpus: every
    * vector's top-k neighbors by cosine — the primitive semantic dedup
    * and density-based curation build on (SemDeDup prunes within the
    * clusters this graph induces). Unlike [[cosineTopK]] both sides are
    * the corpus, so neither side broadcasts at scale; the pairing is the
    * same TRIANGLE block-pair equality join as the blocked embedding
    * dedup (graft.llm.Dedup.embeddingNearDuplicatesBlocked — composite
    * (ba, bb) key, B(B+1)/2-way parallelism, no CartesianProduct): each
    * unordered pair's cosine computes ONCE, both directions fan out of
    * it, and ranking is the bounded top-k UDAF per source — partition
    * parallel, no global sort. Exact kNN is the verification baseline;
    * the sub-quadratic scale path restricts the pairing with IVF/LSH
    * (s03/s05) once recall < 1 is acceptable.
    * Output: (vec_id, rnk, neighbor_id, cos_sim).
    */
  def knnGraph(embs: DataFrame, idCol: String, vecCol: String, k: Int,
      numBlocks: Int = 8): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val e = embs.select(col(idCol).cast("bigint").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("blk", pmod(xxhash64(col("id")), lit(numBlocks)).cast("int"))
    val blockPairs = (for { i <- 0 until numBlocks; j <- i until numBlocks }
      yield (i, j)).toDF("ba", "bb")
    val a = e.select(col("id").as("a_id"), col("v").as("va"),
      col("blk").as("ba")).join(broadcast(blockPairs), "ba")
    val b = e.select(col("id").as("b_id"), col("v").as("vb"),
      col("blk").as("bb")).join(broadcast(blockPairs), "bb")
    val sims = a.join(b.hint("SHUFFLE_HASH"), Seq("ba", "bb"))
      // same-block cells see every pair from both sides — keep one
      .filter(col("ba") =!= col("bb") || col("a_id") < col("b_id"))
      .withColumn("sim", cosineSim(col("va"), col("vb")))
      .select(col("a_id"), col("b_id"), col("sim"))
    // both directions from ONE pass over the pair pipeline: a
    // union(sims, sims.flipped) would re-execute the triangle join —
    // and its cosine — twice; the explode fans each pair out in place
    val directed = sims
      .select(explode(array(
        struct(col("a_id").as("query_id"), col("b_id").as("neighbor_id"),
          col("sim")),
        struct(col("b_id").as("query_id"), col("a_id").as("neighbor_id"),
          col("sim")))).as("p"))
      .select(col("p.query_id"), col("p.neighbor_id"), col("p.sim"))
    topKPerQuery(directed, k).withColumnRenamed("query_id", "vec_id")
  }

  /** Embedding-space OUTLIER detection from the kNN graph: a vector
    * whose mean cosine to its own k nearest neighbors is lowest sits
    * isolated in embedding space — mis-embedded, off-distribution, or
    * garbage input, the rows a curation pass routes to review. Pure
    * composition: [[knnGraph]] (one triangle-join pass) then a per-node
    * mean and a bounded top-k of the LOWEST means — no new shuffle
    * shape, and the threshold list is `k` rows. Output:
    * (vec_id, mean_knn_sim) for the `nOutliers` most isolated vectors,
    * ties toward the smaller vec_id.
    */
  def knnOutliers(embs: DataFrame, idCol: String, vecCol: String, k: Int,
      nOutliers: Int): DataFrame =
    knnGraph(embs, idCol, vecCol, k)
      .groupBy("vec_id")
      .agg(round(avg(col("cos_sim")), 4).as("mean_knn_sim"))
      .orderBy(col("mean_knn_sim"), col("vec_id"))
      .limit(nOutliers)

  /** Retrieval evaluation IN the engine: score a candidate top-k
    * relation against a ground-truth top-k relation (both shaped
    * (query_id, rnk, neighbor_id, ...) like every ANN path here
    * produces) — per query, recall@k (fraction of the true top-k the
    * candidate list found) and MRR (reciprocal rank of the first
    * relevant hit, 0 when none). This is the harness that watches a
    * production ANN index drift: truth from a periodic exact pass over
    * a query sample, candidates from the serving path.
    *
    * One broadcast-sized join (k rows per query on each side) and one
    * aggregation — the eval costs nothing next to either retrieval.
    * Output: (query_id, recall_at_k, mrr) rounded to 4.
    */
  def retrievalEval(result: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    require(k > 0)
    val t = truth.select(col("query_id").as("query_id"),
      col("neighbor_id").as("neighbor_id"), lit(1L).as("rel"))
    result.select(col("query_id"), col("rnk"), col("neighbor_id"))
      .join(t, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(
        round(coalesce(sum(col("rel")), lit(0L)) / k.toDouble, 4)
          .as("recall_at_k"),
        round(coalesce(max(when(col("rel") === 1L,
          lit(1.0) / col("rnk"))), lit(0.0)), 4).as("mrr"))
  }

  /** SemDeDup-style semantic pruning: given the corpus and a relation of
    * near-duplicate pairs `(a_id, b_id, ...)` with `a_id < b_id` (any of
    * the pair generators — exact blocked, LSH-banded, or IVF-restricted —
    * produces this shape), a vector is PRUNED iff some pair names it as
    * the higher id, i.e. it has a near-neighbor with a smaller id. One
    * deterministic pass, no cascading: a pruned vector can itself prune a
    * later one (the chain x0~x1, x1~x2, x0!~x2 drops BOTH x1 and x2) —
    * the keep-first-occurrence semantics of the published SemDeDup
    * recipe, which keeps one representative per similarity neighborhood
    * rather than re-running closure over survivors.
    *
    * Scale shape: one hash aggregation over the pair relation (min
    * pruner per victim) plus one left join back to the corpus ids — cost
    * is proportional to the pair set, and the pair set comes from a
    * sub-quadratic generator at scale. Output: (vec_id, kept,
    * pruned_by) with pruned_by = -1 for survivors.
    */
  def semDedupPrune(corpus: DataFrame, pairs: DataFrame,
      idCol: String): DataFrame = {
    val pruners = pairs
      .groupBy(col("b_id").as("vec_id"))
      .agg(min(col("a_id")).as("first_pruner"))
    corpus.select(col(idCol).cast("bigint").as("vec_id"))
      .join(pruners, Seq("vec_id"), "left")
      .select(col("vec_id"), col("first_pruner").isNull.as("kept"),
        coalesce(col("first_pruner"), lit(-1L)).as("pruned_by"))
  }

  /** Leave-one-out k-nearest-neighbor label prediction over the corpus —
    * the embedding-space quality/domain classifier shape data-curation
    * pipelines use (label a small seed set, propagate to the corpus by
    * nearest neighbors, filter on the prediction). Each vector's label is
    * predicted by majority vote of its k nearest OTHER vectors' labels
    * (ties broken toward the smaller label id — deterministic).
    *
    * Scale shape: rides on [[knnGraph]] (triangle block-pair join,
    * bounded top-k), then one equality join to the label table keyed by
    * neighbor id and two hash aggregations (vote count per (vector,
    * label), max-struct argmax per vector) — no windows, no driver
    * state. Output: (vec_id, label, pred_label, votes).
    */
  def knnClassify(embs: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int, numBlocks: Int = 8): DataFrame = {
    val labels = embs.select(col(idCol).cast("bigint").as("neighbor_id"),
      col(labelCol).cast("int").as("n_label"))
    val votes = knnGraph(embs, idCol, vecCol, k, numBlocks)
      .join(labels, "neighbor_id")
      .groupBy(col("vec_id"), col("n_label"))
      .agg(count(lit(1)).as("votes"))
    // argmax by (votes, then smaller label): max of struct orders
    // lexicographically, so negate the label for the tie preference
    val best = votes
      .groupBy("vec_id")
      .agg(max(struct(col("votes"), (-col("n_label")).as("neg"))).as("m"))
      .select(col("vec_id"), (-col("m.neg")).as("pred_label"),
        col("m.votes").as("votes"))
    embs.select(col(idCol).cast("bigint").as("vec_id"),
        col(labelCol).cast("int").as("label"))
      .join(best, "vec_id")
  }

  /** k-NN label prediction for UNLABELED vectors from a labeled SEED
    * set — the production shape of embedding-space quality/domain
    * classification: curators hand-label a small seed set, and every
    * corpus vector takes the majority label of its k nearest seeds
    * (ties toward the smaller label id). The complement of
    * [[knnClassify]]'s leave-one-out evaluation: there the corpus
    * classifies itself; here a tiny labeled side classifies a huge
    * unlabeled side.
    *
    * Scale shape: the seed set is the SMALL side, so the scoring join
    * broadcasts it ([[cosineTopK]] — every corpus partition scores its
    * rows against the broadcast seeds locally, bounded top-k per row,
    * no shuffle of the corpus); the vote is two hash aggregations.
    * Output: (vec_id, pred_label, votes).
    */
  def knnClassifySeeded(unlabeled: DataFrame, seeds: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int): DataFrame = {
    // NOTE the broadcast direction is the TRANSPOSE of [[cosineTopK]]
    // (which broadcasts the query side): here the seeds are the small
    // side, every corpus partition scores its own rows against them, and
    // the bounded top-k's map-side partial completes within the row's
    // partition — the shuffle moves at most k rows per corpus vector
    val q = unlabeled.select(col(idCol).cast("bigint").as("query_id"),
      col(vecCol).cast("array<double>").as("vq"))
    val s = seeds.select(col(idCol).cast("bigint").as("neighbor_id"),
      col(vecCol).cast("array<double>").as("vc"),
      col(labelCol).cast("int").as("n_label"))
    val scored = q.crossJoin(broadcast(s))
      .withColumn("sim", cosineSim(col("vq"), col("vc")))
      .select("query_id", "neighbor_id", "sim")
    val seedLabels = s.select(col("neighbor_id"), col("n_label"))
    val votes = topKPerQuery(scored, k)
      .join(broadcast(seedLabels), "neighbor_id")
      .groupBy(col("query_id"), col("n_label"))
      .agg(count(lit(1)).as("votes"))
    votes.groupBy("query_id")
      .agg(max(struct(col("votes"), (-col("n_label")).as("neg"))).as("m"))
      .select(col("query_id").as("vec_id"), (-col("m.neg")).as("pred_label"),
        col("m.votes").as("votes"))
  }

  /** Hard-negative mining for contrastive retrieval training: for each
    * query vector, the k most similar corpus vectors that are NOT its
    * near-duplicates — semantically close but genuinely different, the
    * negatives that make a bi-encoder's loss informative (a near-dup
    * mislabeled as a negative poisons training; a random negative
    * teaches nothing). Exclusion consumes the dedup pipeline's own PAIR
    * RELATION `(a_id, b_id, ...)` rather than re-thresholding cosines,
    * so whatever near-dup definition curated the corpus (MinHash,
    * SimHash, embedding, incremental) is exactly what the miner
    * respects.
    *
    * Scale shape: queries broadcast into the corpus scan like
    * [[cosineTopK]]; the exclusion is one anti-join against the
    * symmetrized pair relation keyed on (query, neighbor) — cost ∝
    * pairs touching the queries — and ranking stays the bounded top-k.
    * Output: (query_id, rnk, neighbor_id, cos_sim).
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, pairs: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).cast("bigint").as("neighbor_id"),
      col(vecCol).cast("array<double>").as("vc"))
    val q = queries.select(col(idCol).cast("bigint").as("query_id"),
      col(vecCol).cast("array<double>").as("vq"))
    val exclude = pairs
      .select(explode(array(
        struct(col("a_id").as("query_id"), col("b_id").as("neighbor_id")),
        struct(col("b_id").as("query_id"), col("a_id").as("neighbor_id"))))
        .as("p"))
      .select(col("p.query_id"), col("p.neighbor_id"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosineSim(col("vq"), col("vc")))
      .select("query_id", "neighbor_id", "sim")
      .join(exclude, Seq("query_id", "neighbor_id"), "left_anti")
    topKPerQuery(scored, k)
  }

  /** Symmetric int8 scalar quantization of an embedding column — the
    * storage-compression lever for 100 TB embedding tables (4x smaller
    * than float32, and int8 dot products are SIMD-friendly downstream).
    * Per-vector scale = max(|x|)/127; q_i = floor(x_i/scale + 0.5)
    * (floor-based half-up is identical IEEE arithmetic on every engine,
    * so the quantized codes are bit-reproducible cross-engine — plain
    * round() ties are not). Degenerate all-zero vectors would give
    * scale = 0 and x/scale = NaN (which non-ANSI CAST silently turns
    * into 0 while other engines error) — they quantize to all-zero codes
    * via a guarded scale instead. Output: (id, scale, q: array<int>).
    */
  def quantizeInt8(embeddings: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    embeddings
      .select(col(idCol).as("vec_id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("scale", expr(
        "aggregate(v, 0D, (m, x) -> greatest(m, abs(x))) / 127.0"))
      .withColumn("q", expr(
        "CASE WHEN scale = 0D THEN transform(v, x -> 0) " +
          "ELSE transform(v, x -> CAST(floor(x / scale + 0.5) AS INT)) END"))
      .select(col("vec_id"), round(col("scale"), 8).as("scale"), col("q"))

  /** Dequantized vectors: q_i * scale (lossy inverse of [[quantizeInt8]]). */
  def dequantize(quantized: DataFrame): DataFrame =
    quantized.withColumn("v",
      expr("transform(q, x -> CAST(x AS DOUBLE) * scale)"))

  /** Deterministic pseudo-gaussian hyperplanes (Box-Muller over
    * java.util.Random, spec-fixed LCG => reproducible signatures).
    */
  private def hyperplanes(numPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(numPlanes, dim)(rnd.nextGaussian())
  }

  /** Random-hyperplane signature as `numBands` bucket ids of `rowsPerBand`
    * bits each: (id, band, bucket). The plane matrix rides along as a
    * broadcast literal inside the expression tree (tiny: planes x dim).
    * `dim` is the embedding dimensionality; pass it when known — the
    * `None` fallback runs a one-row Spark job to probe it, which is an
    * extra driver-side job per call (callers that bucket both a corpus
    * and a query set should probe once and share the value).
    */
  def rhpBuckets(df: DataFrame, idCol: String, vecCol: String,
      numBands: Int, rowsPerBand: Int, seed: Long = 7L,
      dim: Option[Int] = None): DataFrame = {
    val d = dim.getOrElse(df.select(size(col(vecCol))).head().getInt(0))
    val planes = hyperplanes(numBands * rowsPerBand, d, seed)
    // all band buckets in ONE fused native pass (RhpBuckets expression):
    // the earlier per-plane aggregate(zip_with(...)) literals evaluated
    // 640 interpreted lambda chains per row at the d11 default and
    // serialized every plane into the task binary (~50 s at sf0.1 →
    // sub-second); the plane matrix now rides as one reference object
    df.select(col(idCol).cast("bigint").as("id"),
        posexplode(graft.functions.RhpBuckets.rhpBuckets(
          col(vecCol), planes, rowsPerBand)).as(Seq("band", "bucket")))
      .select(col("id"), col("band").cast("int").as("band"), col("bucket"))
  }

  /** IVF (inverted-file) ANN: a KMeans coarse quantizer (spark.ml, fixed
    * seed) partitions the corpus into nlist cells; queries probe their
    * nProbe nearest centroids and re-rank exactly within those cells only.
    * This is the classic large-scale layout: the corpus is written
    * partitioned by cell, so a probe touches nProbe/nlist of the data —
    * at 100 TB that is the difference between a full scan and a targeted
    * read. Approximate => no SQL oracle; recall asserted in specs.
    */
  /** Nearest-`n` coarse-quantizer cells per vector (ties broken by cell
    * id): the assignment step shared by index construction (n=1) and
    * query probing (n=nProbe). Output: (idOut, cell, v).
    */
  private def nearestCells(df: DataFrame, idCol: String, vecCol: String,
      idOut: String, n: Int, centroids: DataFrame): DataFrame = {
    // bounded top-n per vector (same (sim desc, cell asc) order as the
    // row_number window it replaces — identical cells kept): each
    // vector's nlist candidate rows never leave their scan partition, so
    // the map-side partial completes the group in place and the shuffle
    // carries one sketch row per vector — the window formulation
    // re-exchanged and SORTED the (vector x centroid) relation instead
    val topn = udaf(new graft.functions.Udafs.TopKByScore(n),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
    df.select(col(idCol).cast("bigint").as(idOut),
        col(vecCol).cast("array<double>").as("v"))
      .crossJoin(broadcast(centroids
        .withColumn("centroid", col("centroid").cast("array<double>"))))
      .withColumn("sim", cosineSim(col("v"), col("centroid")))
      .groupBy(col(idOut))
      .agg(topn(col("sim"), col("cell").cast("long")).as("tk"),
        first(col("v")).as("v"))
      .select(col(idOut), explode(expr("transform(tk, s -> s._2)"))
        .as("cell_l"), col("v"))
      .select(col(idOut), col("cell_l").cast("int").as("cell"), col("v"))
  }

  /** IVF INDEX construction — the persistable pair an ANN service
    * maintains: a tiny broadcastable centroid table (cell, centroid) and
    * the corpus assignments (cell, neighbor_id, v). At scale, persist
    * the assignments `partitionBy("cell")`: a probe then touches only
    * its nProbe/nlist cells (static or dynamic partition pruning on the
    * cell key), and new batches append their own assignments without
    * re-clustering — re-fit centroids only when drift warrants it.
    */
  def ivfIndex(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 16, seed: Long = 42L): (DataFrame, DataFrame) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    val train = corpus.select(
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10)
      .fit(train)
    import spark.implicits._
    val cdf = model.clusterCenters.map(_.toArray).zipWithIndex.toSeq
      .toDF("centroid", "cell")
    (cdf, nearestCells(corpus, idCol, vecCol, "neighbor_id", 1, cdf))
  }

  /** Probe a prebuilt IVF index: queries rank the centroid table for
    * their nProbe cells, join the cell-partitioned assignments, and
    * exact cosine re-ranks within the probe set — identical output to
    * [[cosineTopKIvf]] over the same index parameters.
    */
  def cosineTopKIvfIndexed(queries: DataFrame, idCol: String,
      vecCol: String, centroids: DataFrame, assignments: DataFrame,
      k: Int, nProbe: Int = 4): DataFrame = {
    val queryCells = nearestCells(queries, idCol, vecCol, "query_id",
      nProbe, centroids).withColumnRenamed("v", "vq")
    topKPerQuery(
      queryCells.join(
          assignments.withColumn("v", col("v").cast("array<double>")), "cell")
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("sim", cosineSim(col("vq"), col("v")))
        .select("query_id", "neighbor_id", "sim"), k)
  }

  def cosineTopKIvf(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nProbe: Int = 4): DataFrame = {
    val (centroids, assignments) = ivfIndex(corpus, idCol, vecCol, nlist)
    cosineTopKIvfIndexed(queries, idCol, vecCol, centroids, assignments,
      k, nProbe)
  }

  /** LSH-bucketed ANN: candidates collide with the query in >=1 band; exact
    * cosine re-rank on candidates only. Same output shape as [[cosineTopK]].
    * Approximate in general — but on a GAPPED corpus (true neighbors at
    * cos >= ~0.9 over an isotropic background, e.g.
    * [[plantedGappedCorpus]]) the banding recall is effectively 1: at
    * cos 0.95 the per-plane agreement is 1 - acos(0.95)/pi ~ 0.90, so 32
    * bands x 8 rows miss a true pair with probability
    * (1 - 0.90^8)^32 < 1e-7 — which is why the s02 gate carries a hard
    * exact-top-k DuckDB oracle instead of a rows-only check.
    * `dim` (embedding dimensionality) is probed once and shared by both
    * bucketing passes when not supplied.
    */
  def cosineTopKLsh(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, numBands: Int = 8, rowsPerBand: Int = 4,
      dim: Option[Int] = None): DataFrame = {
    val d = Some(dim.getOrElse(
      corpus.select(size(col(vecCol))).head().getInt(0)))
    val cb = rhpBuckets(corpus, idCol, vecCol, numBands, rowsPerBand, dim = d)
      .withColumnRenamed("id", "neighbor_id")
    val qb = rhpBuckets(queries, idCol, vecCol, numBands, rowsPerBand, dim = d)
      .withColumnRenamed("id", "query_id")
    val cands = qb.join(cb, Seq("band", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()
    val c = corpus.select(col(idCol).cast("bigint").as("cid"),
      col(vecCol).cast("array<double>").as("vc"))
    val q = queries.select(col(idCol).cast("bigint").as("qid"),
      col(vecCol).cast("array<double>").as("vq"))
    topKPerQuery(
      cands
        .join(c, col("neighbor_id") === col("cid"))
        .join(broadcast(q), col("query_id") === col("qid"))
        .withColumn("sim", cosineSim(col("vq"), col("vc")))
        .select("query_id", "neighbor_id", "sim"), k)
  }

  // ---------------- Product quantization (IVF-PQ's storage half) -------

  /** L2-normalize `vecCol` into `vn` (zero vectors pass through), keeping
    * `idCol` as `idOut`. Two-step select so the norm computes ONCE per row
    * (a single transform(v, x -> x / sqrt(aggregate(...))) re-evaluates
    * the aggregate per element — O(d^2) per row).
    */
  private def withUnitVec(df: DataFrame, idCol: String, vecCol: String,
      idOut: String): DataFrame =
    df.select(col(idCol).cast("bigint").as(idOut),
        col(vecCol).cast("array<double>").as("_v"))
      .withColumn("_n", expr("sqrt(aggregate(_v, 0D, (a, x) -> a + x * x))"))
      .select(col(idOut), expr(
        "CASE WHEN _n = 0D THEN _v ELSE transform(_v, x -> x / _n) END")
        .as("vn"))

  /** Flattened 3-level SQL literal `array(array(array(double)))` for a
    * [m][k][i] codebook — tiny (numSub x codebookSize x subDim doubles),
    * so it rides inside the expression tree like [[rhpBuckets]]' planes.
    */
  private def cbLiteral(cb: Array[Array[Array[Double]]]): String =
    cb.map(_.map(c => s"array(${c.mkString(",")})")
        .mkString("array(", ",", ")"))
      .mkString("array(", ",", ")")

  /** Train product-quantization codebooks: split each L2-normalized
    * vector into `numSub` subvectors of dim/numSub dims and run
    * `iters` Lloyd rounds with `codebookSize` centroids PER SUBSPACE —
    * all subspaces in the SAME distributed pass (one assignment join +
    * one re-estimation aggregation per round moves every (vector,
    * subspace) pair at once; spark.ml would be numSub sequential fits).
    * Deterministic: centroids seed from the codebookSize smallest-id
    * vectors, ties in assignment break toward the smaller centroid id,
    * empty clusters keep their previous position. The per-round centroid
    * state is numSub*codebookSize rows, so it collects to the driver
    * (like spark.ml's own Lloyd loop) and re-broadcasts — the LINEAGE
    * stays flat without checkpoints. At 100 TB, train on an upstream
    * sample (codebooks need ~1e5 vectors, not the corpus) and
    * [[pqEncode]] the full corpus with the result.
    *
    * Returns cb[m][k] = centroid (subDim doubles).
    */
  def pqTrainCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      numSub: Int = 8, codebookSize: Int = 32, iters: Int = 10,
      dim: Option[Int] = None): Array[Array[Array[Double]]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val d = dim.getOrElse(corpus.select(size(col(vecCol))).head().getInt(0))
    require(d % numSub == 0, s"dim $d not divisible by numSub $numSub")
    val sub = d / numSub
    val base = withUnitVec(corpus, idCol, vecCol, "id")
    // (id, m, sv) — reused every Lloyd round, so cut lineage + materialize
    val subs = base.select(col("id"), expr(
        s"explode(transform(sequence(0, ${numSub - 1}), " +
          s"m -> named_struct('m', m, 'sv', slice(vn, m * $sub + 1, $sub))))")
        .as("e"))
      .select(col("id"), col("e.m").as("m"), col("e.sv").as("sv"))
      .localCheckpoint(true)
    val seedRows = base.orderBy("id").limit(codebookSize).collect()
    require(seedRows.length == codebookSize,
      s"corpus smaller than codebookSize=$codebookSize")
    val cb: Array[Array[Array[Double]]] = Array.tabulate(numSub) { m =>
      seedRows.map(_.getSeq[Double](1).slice(m * sub, (m + 1) * sub).toArray)
    }
    for (_ <- 0 until iters) {
      val cdf = cb.indices.flatMap(m => cb(m).indices.map(k =>
        (m, k, cb(m)(k).toSeq))).toDF("m", "k", "c")
      val assigned = subs.join(broadcast(cdf), "m")
        // fused native distance (one codegen'd loop) — the HOF
        // formulation evaluated an interpreted lambda per element for
        // every (subvector, codebook entry) pair
        .withColumn("d2",
          graft.functions.SquaredL2.squaredL2(col("sv"), col("c")))
        .groupBy("id", "m")
        .agg(min_by(struct(col("k"), col("sv")),
          struct(col("d2"), col("k"))).as("b"))
        .select(col("m"), col("b.k").as("k"), col("b.sv").as("sv"))
      val upd = assigned
        .select(col("m"), col("k"), posexplode(col("sv")).as(Seq("i", "x")))
        .groupBy("m", "k", "i")
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("cnt"))
        .groupBy("m", "k")
        .agg(expr("transform(array_sort(collect_list(" +
          "named_struct('i', i, 'v', sx / cnt))), s -> s.v)").as("c"))
        .collect()
      upd.foreach { r =>
        cb(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray
      }
    }
    cb
  }

  /** Persistable codebook relation (m, k, centroid) for [[pqTrainCodebooks]]'
    * result; [[collectCodebooks]] inverts it.
    */
  def codebooksDf(spark: org.apache.spark.sql.SparkSession,
      cb: Array[Array[Array[Double]]]): DataFrame = {
    import spark.implicits._
    cb.indices.flatMap(m => cb(m).indices.map(k => (m, k, cb(m)(k).toSeq)))
      .toDF("m", "k", "centroid")
  }

  /** Driver-side codebook array from a persisted (m, k, centroid)
    * relation — numSub x codebookSize rows, i.e. kilobytes.
    */
  def collectCodebooks(codebooks: DataFrame): Array[Array[Array[Double]]] = {
    val rows = codebooks.select("m", "k", "centroid").collect()
    val numSub = rows.map(_.getInt(0)).max + 1
    val k = rows.map(_.getInt(1)).max + 1
    val cb = Array.ofDim[Array[Double]](numSub, k)
    rows.foreach(r => cb(r.getInt(0))(r.getInt(1)) =
      r.getSeq[Double](2).toArray)
    cb.map(_.map(c => c))
  }

  /** PQ-encode a vector column: one codegen'd PROJECTION per row — the
    * codebook rides as a literal (like [[rhpBuckets]]' planes) and each
    * subspace takes the argmax of (subvector . centroid - |centroid|^2/2),
    * the dot-product form of nearest-centroid (ties toward the smaller
    * code). No join, no shuffle: this is the shape that encodes a 100 TB
    * corpus (or an incremental batch) in a single map pass, shrinking
    * each vector to numSub small ints — the 16x scan-bandwidth lever the
    * ADC probe exploits. Output: (idOut, codes: array<int>).
    */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
      cb: Array[Array[Array[Double]]], idOut: String = "vec_id"): DataFrame = {
    val numSub = cb.length
    val k = cb(0).length
    val sub = cb(0)(0).length
    val cbl = cbLiteral(cb)
    // ||c||^2/2 per (m, k), as a 2-level literal
    val cn = cb.map(_.map(c => c.map(x => x * x).sum / 2.0)
        .mkString("array(", ",", ")"))
      .mkString("array(", ",", ")")
    val dot = s"aggregate(sequence(1, $sub), 0D, (a, i) -> " +
      s"a + element_at(vn, m * $sub + i) * " +
      s"element_at(element_at(element_at($cbl, m + 1), k + 1), i))"
    withUnitVec(df, idCol, vecCol, idOut)
      .select(col(idOut), expr(
        s"transform(sequence(0, ${numSub - 1}), m -> CAST(-array_max(" +
          s"transform(sequence(0, ${k - 1}), k -> named_struct(" +
          s"'s', $dot - element_at(element_at($cn, m + 1), k + 1), " +
          "'nk', -k))).nk AS INT))").as("codes"))
  }

  /** ANN via asymmetric-distance (ADC) PQ scan + exact re-rank: each
    * query builds a lookup table lut[m][k] = (query subvector . centroid)
    * — numSub x codebookSize doubles, broadcast with the query — and a
    * corpus vector's approximate cosine is then numSub table lookups over
    * its CODES (never its floats): the full scan reads numSub ints per
    * vector instead of dim doubles, the 100 TB bandwidth win. The top
    * `nCandidates` per query by ADC score (bounded two-phase top-k, no
    * global sort) are re-ranked with EXACT cosine over the original
    * vectors, so with a candidate budget that covers the true top-k the
    * output EQUALS the exact [[cosineTopK]]. On the gapped corpus that
    * holds because a planted near-dup is a tiny rotation of its query —
    * it quantizes onto (nearly) the query's own codes, so its ADC score
    * tops the scan even though isotropic random fixtures keep per-vector
    * quantization residuals near the rate-distortion floor (~0.65
    * relative; real clustered embeddings sit far lower). Output:
    * (query_id, rnk, neighbor_id, cos_sim).
    */
  def cosineTopKPq(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, cb: Array[Array[Array[Double]]], codes: DataFrame,
      k: Int, nCandidates: Int = 64): DataFrame = {
    // native fused LUT build (graft.functions.PqQueryLut): the codebook
    // rides as one reference object instead of a multi-kilobyte parsed
    // array literal — the literal formulation re-parsed and re-analyzed
    // numSub x codebookSize x subDim nested array() calls on EVERY
    // query construction (hundreds of ms of driver time per call) and
    // evaluated three interpreted element_at chains per (m, k, i)
    val qlut = withUnitVec(queries, idCol, vecCol, "query_id")
      .select(col("query_id"),
        graft.functions.PqQueryLut.queryLut(col("vn"), cb).as("lut"))
    val adc = codes
      .join(broadcast(qlut), col("query_id") =!= col("neighbor_id"))
      // native indexed loop (graft.functions.PqAdcScore) — the
      // interpreted aggregate/element_at HOF chain walked three
      // interpreted lookups per subspace per scored pair
      .withColumn("sim",
        graft.functions.PqAdcScore.adcScore(col("lut"), col("codes")))
      .select("query_id", "neighbor_id", "sim")
    val cands = topKPerQuery(adc, nCandidates)
      .select(col("query_id"), col("neighbor_id"))
    val c = corpus.select(col(idCol).cast("bigint").as("neighbor_id"),
      col(vecCol).cast("array<double>").as("vc"))
    val q = queries.select(col(idCol).cast("bigint").as("query_id"),
      col(vecCol).cast("array<double>").as("vq"))
    topKPerQuery(
      cands.join(c, "neighbor_id").join(broadcast(q), "query_id")
        .withColumn("sim", cosineSim(col("vq"), col("vc")))
        .select("query_id", "neighbor_id", "sim"), k)
  }

  /** Deterministic GAPPED ANN corpus: the raw embedding table (isotropic
    * background — pairwise cos <= ~0.5 on the fixtures) plus, for each
    * query id q < `nQueries`, `perQuery` planted near-duplicates
    * v_q + 0.3 * v_p (partner p = nQueries + q*perQuery + j), published
    * under vec_id = 100000 + q*perQuery + j. The planted vectors sit at
    * cos(v_q, v_q + 0.3*v_p) in [0.95, 0.98] from their query (0.3 mixing
    * against a near-orthogonal partner barely rotates the vector), while
    * everything else stays below ~0.65 — a provable similarity gap, so a
    * recall-1 parameterization of the banded/IVF ANN paths exists and
    * their output must EQUAL the exact top-k. Every arithmetic step is
    * plain IEEE double (+, *), so a SQL engine reproduces the corpus
    * bit-identically — which is what turns the approximate-ANN gate rows
    * into hard DuckDB-oracle rows (s02/s03).
    */
  /** Chunk -> featurize -> retrieve: the RAG indexing/serving chain as
    * ONE declarative plan. Documents are cut into overlapping windows
    * ([[TextAnalysis.chunkDocuments]]), every chunk gets a deterministic
    * 8-dim hash-count embedding (count of words whose first character
    * falls in each ascii%8 class — integer-valued, so the vector is
    * exact in any float width and a SQL engine recomputes it verbatim),
    * and chunks below `queryKeyBelow` retrieve their top-k neighbors
    * from the rest of the chunk corpus by cosine.
    *
    * Ranking happens on the ROUNDED similarity (4 places, ties by
    * neighbor id): coarse integer features make mathematically-equal
    * cosines common (parallel count vectors), and ranking on raw
    * doubles would let last-ulp association differences between engines
    * reorder those pseudo-ties. Scale shape: chunking and featurization
    * are narrow per-row ops; the query side broadcasts; top-k is the
    * bounded two-phase [[graft.functions.Udafs.TopKByScore]] merge, not
    * a per-query window sort.
    * Output: (query_id, rnk, neighbor_id, cos_sim).
    */
  def ragRetrieve(docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int, k: Int, queryKeyBelow: Long,
      keyFactor: Long = 100L): DataFrame = {
    import graft.functions.CosineSimilarity.cosineSim
    val chunks = TextAnalysis.chunkDocuments(docs, idCol, textCol,
      window, stride)
    // one fused byte-level pass (WordBucketCounts) — the per-bucket
    // filter(split(...)) formulation evaluated 8 interpreted HOF chains
    // (each with its own split) per chunk row
    val embedded = chunks.select(
      (col("doc_id") * keyFactor + col("chunk_id")).as("chunk_key"),
      graft.functions.WordBucketCounts
        .wordBucketCounts(col("chunk_text"), 8)
        .cast("array<double>").as("embedding"))
    val q = embedded.filter(col("chunk_key") < queryKeyBelow)
      .select(col("chunk_key").as("query_id"), col("embedding").as("vq"))
    val c = embedded.filter(col("chunk_key") >= queryKeyBelow)
      .select(col("chunk_key").as("neighbor_id"), col("embedding").as("vc"))
    val topk = udaf(new graft.functions.Udafs.TopKByScore(k),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[(Double, Long)]())
    c.join(broadcast(q), lit(true))
      .withColumn("sim", round(cosineSim(col("vq"), col("vc")), 4))
      .groupBy("query_id")
      .agg(topk(col("sim"), col("neighbor_id")).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "sn")))
      .select(col("query_id"), (col("pos") + 1).as("rnk"),
        col("sn._2").as("neighbor_id"), col("sn._1").as("cos_sim"))
  }

  def plantedGappedCorpus(emb: DataFrame, idCol: String, vecCol: String,
      nQueries: Int = 10, perQuery: Int = 5): DataFrame = {
    val base = emb.select(col(idCol).cast("bigint").as("vec_id"),
      col(vecCol).cast("array<double>").as("embedding"))
    val planted = base.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("vq"),
        explode(expr(s"sequence(0, ${perQuery - 1})")).as("j"))
      .withColumn("pid", lit(nQueries) + col("qid") * perQuery + col("j"))
      .join(base.select(col("vec_id").as("pid"), col("embedding").as("vp")),
        "pid")
      .select((lit(100000L) + col("qid") * perQuery + col("j")).as("vec_id"),
        expr("zip_with(vq, vp, (x, y) -> x + 0.3D * y)").as("embedding"))
    base.unionByName(planted)
  }
}
