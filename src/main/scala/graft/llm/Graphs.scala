package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph centrality over corpus-derived relations (the kNN graph of
  * [[Similarity.knnGraph]], the duplicate-pair relation of
  * [[Dedup]]) — used to rank documents by connectivity when curating:
  * a page that many near-neighbors point at is a hub worth keeping
  * (or a template worth dropping), cf. the harmonic/PageRank corpus
  * filters in the Common Crawl literature.
  *
  * Reference analog: PostBOUND ships graph machinery for JOIN graphs
  * (`/root/reference/postbound/qal/_qal.py` predicates →
  * `util/networkx.py` helpers); corpus-graph centrality is the
  * data-pipeline counterpart, built here Spark-first as iterative
  * DataFrame joins (an edge-partitioned Pregel step per round).
  */
object Graphs {

  /** Fixed-point PageRank: `iters` synchronous power-iteration rounds
    * over an integer rank vector in units of `scale^-1` (rank mass
    * `scale` distributed over the nodes). ALL arithmetic is BIGINT —
    * rank share `((r * dampingPct) div 100) div outdeg`, teleport
    * `((100 - dampingPct) * (scale div n)) div 100` — so partial sums
    * are associative and the result is bit-identical on ANY engine and
    * ANY partitioning/accumulation order: a floating-point PageRank's
    * shuffle-order-dependent ulps would defeat both the DuckDB oracle
    * and cross-run reproducibility of a curation pipeline (the same
    * corpus must always keep the same documents). Truncation loses
    * < 1 unit per (edge, round) — bounded drift, deterministic.
    *
    * Scale: each round is one shuffle sized by |edges| (join ranks →
    * aggregate contributions by dst) plus a broadcast-sized degree
    * join; the rank vector is |nodes| rows, localCheckpoint'd per
    * round to keep lineage flat (the d07 lesson). Dangling nodes
    * (present only as dst) contribute nothing but still receive
    * teleport + in-flow, matching the "sink mass evaporates" PageRank
    * variant — documented, deterministic, and mirrored in the oracle.
    *
    * Output: (node BIGINT, rank_fp BIGINT).
    */
  def pagerankFixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 5, dampingPct: Int = 85,
      scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 0 && dampingPct >= 0 && dampingPct <= 100)
    // Loop invariants live in the slim bounded cache
    // (Dedup.scopedCacheSlim): the expensive edge pipeline (for gr01/gr02
    // that is the full kNN-graph triangle join) materializes ONCE into
    // cached blocks — not once per invocation like the eager
    // localCheckpoint it replaces — and downstream plans see a one-node
    // LogicalRDD, so the per-round joins never re-analyze the pipeline
    // tree. (Pre-partitioning the invariants does NOT pay — neither via
    // localCheckpoint nor via cache: under AQE both report
    // UnknownPartitioning before execution, so the per-round join
    // re-exchanges either way — verified in the r18 AND r19 plans.)
    val e0 = Dedup.scopedCacheSlim(
      edges.select(col(srcCol).cast("bigint").as("src"),
        col(dstCol).cast("bigint").as("dst")))
    val nodes = Dedup.scopedCacheSlim(e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node")))
      .distinct())
    val n = nodes.count()
    require(n > 0, "empty graph")
    val base = scale / n
    val teleport = (100L - dampingPct) * base / 100L
    // hoist the outdegree join out of the loop: (src, dst, d) costs one
    // extra int column on the edge table but saves an edge-sized join
    // PER ROUND
    val e = Dedup.scopedCacheSlim(
      e0.join(e0.groupBy("src").agg(count(lit(1)).as("d")), "src"))
    var r = nodes.select(col("node"), lit(base).as("r"))
    for (i <- 0 until iters) {
      val contrib = e.join(r.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr(s"((r * $dampingPct) div 100) div d").as("share"))
        .groupBy("node").agg(sum("share").as("inc"))
      r = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + coalesce(col("inc"), lit(0L))).as("r"))
      // cut lineage every few rounds, not every round: an eager
      // checkpoint serializes the round into a full materialization,
      // and a 3-round join chain is well within planner comfort
      if (i % 3 == 2 && i != iters - 1) r = r.localCheckpoint(true)
    }
    r.select(col("node"), col("r").as("rank_fp"))
  }

  /** Semi-supervised LABEL PROPAGATION over a directed neighbor graph
    * (e.g. the kNN graph): seed nodes carry a known label (quality tier,
    * topic, license class — the small hand-audited set); every other
    * node takes, each synchronous round, the MAJORITY label among its
    * out-neighbors' current labels, ties to the smallest label id,
    * staying unlabeled (-1) while no neighbor is labeled. Seeds are
    * CLAMPED (they never change — the Zhu/Ghahramani semi-supervised
    * variant), so label mass flows outward from the audited set.
    *
    * Everything is integer — vote counts are BIGINT, the argmax is a
    * lexicographic struct-min — so the result is bit-identical on any
    * partitioning and a serial oracle can unroll the rounds.
    *
    * Scale: per round one edge-sized join + one (node, label)-keyed
    * aggregation; the label vector is |nodes| rows. Same shuffle
    * economics as [[pagerankFixedPoint]].
    *
    * Output: (node, label) after `iters` rounds.
    */
  def labelPropagate(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedNodeCol: String, seedLabelCol: String,
      iters: Int): DataFrame = {
    require(iters >= 0)
    // loop invariants in the slim bounded cache (see pagerankFixedPoint);
    // the edge relation's canonicalized plan matches gr01's, so the kNN
    // graph materializes once and BOTH graph gates read the same blocks
    val e0 = Dedup.scopedCacheSlim(
      edges.select(col(srcCol).cast("bigint").as("src"),
        col(dstCol).cast("bigint").as("dst")))
    val sd = seeds.select(col(seedNodeCol).cast("bigint").as("node"),
      col(seedLabelCol).cast("bigint").as("seed"))
    // node table with the seed column FOLDED IN — the old per-round
    // (nodes ⋈ best ⋈ sd) double join becomes a single join per round
    val ns = Dedup.scopedCacheSlim(e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node")))
      .distinct()
      .join(sd, Seq("node"), "left"))
    var lab = ns.select(col("node"), coalesce(col("seed"), lit(-1L)).as("lab"))
    for (i <- 0 until iters) {
      val best = e0
        .join(lab.select(col("node").as("dst"), col("lab").as("nl")), "dst")
        .filter(col("nl") =!= -1L)
        // one src-keyed exchange feeds BOTH vote aggregations: the
        // (src, label) count and the per-src argmax each only need the
        // data clustered by src, and hashpartitioning(src) satisfies
        // both — the old shape paid a (src, nl) exchange AND an src
        // exchange per round
        .repartition(col("src"))
        .groupBy("src", "nl").agg(count(lit(1)).as("c"))
        .groupBy("src")
        .agg(min(struct((-col("c")).as("nc"), col("nl").as("nl"))).as("m"))
        .select(col("src").as("node"), col("m.nl").as("best"))
      lab = ns.join(best, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("seed"), col("best"), lit(-1L)).as("lab"))
      if (i % 3 == 2 && i != iters - 1) lab = lab.localCheckpoint(true)
    }
    lab.select(col("node"), col("lab").as("label"))
  }

  /** DuckDB oracle for [[labelPropagate]] over the kNN graph of the
    * `embeddings` table (k nearest by cosine, s06's edge definition),
    * seeds = rows with `vec_id % seedMod = 0`: the same synchronous
    * rounds unrolled — majority vote via row_number over
    * (count DESC, label ASC), seed clamp via coalesce priority. */
  def labelPropKnnOracleSql(k: Int, iters: Int, seedMod: Long): String = {
    val rounds = (1 to iters).map { r =>
      s"""v$r AS MATERIALIZED (
         SELECT src, lab AS best FROM (
           SELECT e.src, l.lab,
             row_number() OVER (PARTITION BY e.src
               ORDER BY count(*) DESC, l.lab) AS rk
           FROM edges e JOIN l${r - 1} l ON e.dst = l.node
           WHERE l.lab <> -1
           GROUP BY e.src, l.lab) WHERE rk = 1),
       l$r AS MATERIALIZED (
         SELECT n.node, coalesce(sd.seed, v.best, CAST(-1 AS BIGINT)) AS lab
         FROM nodes n LEFT JOIN sd ON sd.node = n.node
         LEFT JOIN v$r v ON v.src = n.node)"""
    }.mkString(",\n")
    s"""WITH c AS MATERIALIZED (
         SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       sims AS MATERIALIZED (
         SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
           list_cosine_similarity(a.v, b.v) AS sim
         FROM c a, c b WHERE a.vec_id <> b.vec_id),
       edges AS MATERIALIZED (
         SELECT vec_id AS src, neighbor_id AS dst FROM
           (SELECT vec_id, neighbor_id,
              row_number() OVER (PARTITION BY vec_id
                ORDER BY sim DESC, neighbor_id) AS rnk
            FROM sims)
         WHERE rnk <= $k),
       nodes AS MATERIALIZED (
         SELECT DISTINCT src AS node FROM edges
         UNION SELECT DISTINCT dst FROM edges),
       sd AS MATERIALIZED (
         SELECT vec_id AS node, CAST(label AS BIGINT) AS seed
         FROM embeddings WHERE vec_id % $seedMod = 0),
       l0 AS MATERIALIZED (
         SELECT n.node, coalesce(sd.seed, CAST(-1 AS BIGINT)) AS lab
         FROM nodes n LEFT JOIN sd ON sd.node = n.node),
       $rounds
       SELECT node, lab AS label FROM l$iters ORDER BY node"""
  }
}
