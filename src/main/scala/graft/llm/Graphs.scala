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
    val e = edges.select(col(srcCol).cast("bigint").as("src"),
      col(dstCol).cast("bigint").as("dst")).localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "empty graph")
    val base = scale / n
    val teleport = (100L - dampingPct) * base / 100L
    val deg = e.groupBy("src").agg(count(lit(1)).as("d"))
      .localCheckpoint(true)
    var r = nodes.select(col("node"), lit(base).as("r"))
    for (i <- 0 until iters) {
      val contrib = e.join(r.withColumnRenamed("node", "src"), "src")
        .join(deg, "src")
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
}
