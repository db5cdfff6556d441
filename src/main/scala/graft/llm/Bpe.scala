package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING inside the engine — the
  * vocabulary-learning step of an LLM data pipeline, done the way BPE is
  * actually trained: on the word-frequency dictionary, not the raw
  * corpus. One corpus-sized aggregation builds `(word, cnt)`; every
  * Lloyd-style merge round after that touches only the dictionary
  * (vocabulary-sized — millions of rows at 100 TB, never the corpus), so
  * the expensive data passes once and the iteration cost is bounded by
  * |vocab| x numMerges.
  *
  * Reference analog: PostBOUND has no tokenizer (it is a query
  * optimizer); the published BPE recipe (Sennrich et al. 2016) defines
  * the semantics this module implements: count adjacent symbol pairs
  * weighted by word frequency, merge the most frequent pair everywhere
  * (greedy left-to-right, non-overlapping), repeat.
  *
  * Determinism: counts are BIGINT (associative — partitioning cannot
  * change them), ties break on (count DESC, lhs ASC, rhs ASC) over ASCII
  * strings (byte order, identical across engines), and merge application
  * is a per-word left fold — so the learned merge table is
  * bit-reproducible and a serial SQL oracle can replay every round
  * (the oracle expresses the same left-to-right non-overlapping pass as
  * run-parity over match positions: within a run of consecutive
  * overlapping matches — only possible for self-pairs (a,a) — exactly
  * the odd positions apply).
  */
object Bpe {

  /** One learned merge: rank is 1-based round order. */
  final case class Merge(rank: Long, lhs: String, rhs: String, count: Long)

  /** Character split without empty-pattern regex ambiguity:
    * [substring(w, i, 1) for i in 1..length(w)]. */
  private def charSyms(w: Column): Column =
    transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1)))

  /** The word-frequency dictionary of a corpus: whitespace tokens with
    * BIGINT counts and their initial character symbolization. */
  def wordDict(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("syms", charSyms(col("word")))

  /** Greedy left-to-right non-overlapping application of one merge to a
    * symbol array: a fold carrying (emitted prefix, pending symbol) —
    * when the pending symbol is `l` and the next is `r` they fuse and
    * the scan skips past both (the fused symbol is NOT reconsidered as a
    * left element this round, exactly the published recipe). Narrow
    * per-row work, no shuffle. */
  private def applyMerge(syms: Column, l: String, r: String): Column = {
    val init = struct(
      expr("cast(array() as array<string>)").as("out"),
      lit(null).cast("string").as("pend"))
    aggregate(syms, init,
      (acc, t) => {
        val out = acc.getField("out")
        val pend = acc.getField("pend")
        when(pend.isNull, struct(out.as("out"), t.as("pend")))
          .when(pend === lit(l) && t === lit(r),
            struct(concat(out, array(lit(l + r))).as("out"),
              lit(null).cast("string").as("pend")))
          .otherwise(struct(concat(out, array(pend)).as("out"),
            t.as("pend")))
      },
      acc => when(acc.getField("pend").isNull, acc.getField("out"))
        .otherwise(concat(acc.getField("out"),
          array(acc.getField("pend")))))
  }

  /** Adjacent-pair counts of the current dictionary, weighted by word
    * frequency: one vocabulary-sized explode + hash aggregation. */
  private def pairCounts(dict: DataFrame): DataFrame =
    dict.select(col("cnt"), explode(arrays_zip(
        slice(col("syms"), lit(1), size(col("syms")) - 1).as("lhs"),
        slice(col("syms"), lit(2), size(col("syms")) - 1).as("rhs")))
        .as("p"))
      .select(col("cnt"), col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .groupBy("lhs", "rhs").agg(sum("cnt").as("c"))

  /** Train `numMerges` BPE merges over the corpus. Returns the learned
    * merge list (driver-side — numMerges rows) and the final symbolized
    * dictionary. Each round collects exactly ONE row (the argmax pair —
    * the map-combined aggregation ships k-row sketches, not the vocab)
    * and rewrites the dictionary with a narrow fold.
    *
    * SCALING SEAM — merge rounds, not data size. Data scale is already
    * solved: the corpus is aggregated exactly once (`wordDict`) and
    * every round after that touches only the vocabulary-sized
    * dictionary with a constant number of Spark jobs (one argmax
    * collect + one checkpoint — spec-pinned linear in LlmOpsSpec), so
    * 100 TB raises only the one-off dictionary build. What does NOT
    * amortize is the ROUND count: exact greedy BPE is inherently
    * sequential (each merge changes the next round's pair counts), so
    * a 32k-entry vocabulary means 32k driver-coordinated job rounds —
    * hours of scheduler latency even though each round is cheap. This
    * implementation is therefore sized for merge counts in the
    * hundreds-to-low-thousands. The scale path beyond that is the
    * standard batched variant: per round take the top-k count-ranked
    * pairs that touch pairwise-disjoint symbols (no shared lhs/rhs, so
    * their applications commute and cannot create or destroy each
    * other's match sites) and apply them in rank order via the same
    * per-word fold ([[applyMergeChain]]) — rounds drop from |vocab| to
    * ~|vocab|/k while the argmax pair is always in the batch, which is
    * how practical distributed BPE trainers approximate the serial
    * recipe — implemented as [[trainMergesBatched]] (spec-pinned:
    * batchSize=1 is bit-identical to this method; larger batches keep
    * within-round symbol disjointness). The batched path is
    * deterministic, so BOTH modes are oracle-gated: batchSize=1 against
    * the serial replay (t25), and k=4 against
    * [[mergesBatchedOracleSql]]'s unrolled-admission replay (t26). */
  def trainMerges(docs: DataFrame, textCol: String,
      numMerges: Int): (Seq[Merge], DataFrame) = {
    require(numMerges >= 0)
    // the corpus-sized dictionary aggregation materializes once into the
    // slim bounded cache (shared by every trainer/segmenter over the
    // same corpus) instead of an eager checkpoint per invocation
    var dict = Dedup.scopedCacheSlim(wordDict(docs, textCol))
    val merges = Seq.newBuilder[Merge]
    var rank = 1L
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val best = pairCounts(dict)
        .orderBy(col("c").desc, col("lhs"), col("rhs")).limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(rank, l, r, c)
        dict = dict.withColumn("syms", applyMerge(col("syms"), l, r))
          .localCheckpoint(true)
        rank += 1
      }
    }
    (merges.result(), dict)
  }

  /** The batched variant the [[trainMerges]] scaladoc describes — the
    * 32k-vocab scale path: per round, collect the count-ranked pair list
    * and greedily admit up to `batchSize` pairs whose symbols are
    * pairwise disjoint (a candidate is admitted only if its lhs, rhs AND
    * fused product are all untouched by earlier admissions this round —
    * the product check matters because a fused "ab" can textually equal
    * a symbol another candidate matches on). Disjoint merges commute and
    * cannot create or destroy each other's match sites, so applying them
    * in rank order via the same per-word fold is well-defined and
    * deterministic. Rounds drop from `numMerges` to ~`numMerges /
    * batchSize`; the argmax pair is always admitted (first candidate,
    * empty conflict set), so `batchSize = 1` reproduces serial greedy
    * BPE bit for bit (spec-pinned). Returns the merges grouped by round
    * so callers can see (and specs can pin) the batch structure.
    */
  def trainMergesBatched(docs: DataFrame, textCol: String,
      numMerges: Int, batchSize: Int): (Seq[Seq[Merge]], DataFrame) = {
    require(numMerges >= 0 && batchSize >= 1)
    var dict = Dedup.scopedCacheSlim(wordDict(docs, textCol))
    val rounds = Seq.newBuilder[Seq[Merge]]
    var rank = 1L
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val want = math.min(batchSize.toLong, numMerges - rank + 1).toInt
      // over-fetch: conflicts thin the ranked prefix, and a too-small
      // batch only costs an extra (cheap) round, never correctness
      val ranked = pairCounts(dict)
        .orderBy(col("c").desc, col("lhs"), col("rhs"))
        .limit(want * 4).collect()
      if (ranked.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val batch = Seq.newBuilder[Merge]
        var n = 0
        ranked.iterator.takeWhile(_ => n < want).foreach { row =>
          val (l, r, c) =
            (row.getString(0), row.getString(1), row.getLong(2))
          if (!used(l) && !used(r) && !used(l + r)) {
            batch += Merge(rank + n, l, r, c)
            used ++= Seq(l, r, l + r)
            n += 1
          }
        }
        val selected = batch.result()
        rounds += selected
        dict = dict.withColumn("syms", applyMergeChain(col("syms"),
            selected.map(m => (m.lhs, m.rhs))))
          .localCheckpoint(true)
        rank += selected.size
      }
    }
    (rounds.result(), dict)
  }

  /** Gate shape of [[trainMerges]]: (merge_rank, lhs, rhs, pair_count)
    * — `merge_rank` rather than the reserved-ish `rank`. */
  def mergesDf(docs: DataFrame, textCol: String,
      numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainMerges(docs, textCol, numMerges)._1
      .map(m => (m.rank, m.lhs, m.rhs, m.count))
      .toDF("merge_rank", "lhs", "rhs", "pair_count")
  }

  /** Segment the corpus with the learned vocabulary: per document, the
    * total piece count after `numMerges` merges — the number a batch
    * sizer feeds on. The corpus side re-tokenizes (narrow) and joins the
    * final dictionary on the word key (vocabulary-sized build side). */
  def segmentCounts(docs: DataFrame, idCol: String, textCol: String,
      numMerges: Int): DataFrame = {
    val (_, dict) = trainMerges(docs, textCol, numMerges)
    val pieces = dict.select(col("word"), size(col("syms")).as("n"))
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .join(pieces, "word")
      .groupBy(idCol).agg(sum(col("n").cast("long")).as("n_pieces"))
  }

  /** Apply a learned merge list IN RANK ORDER to one word's symbols —
    * the serving-time tokenizer: a pure function of the rules, no
    * dictionary join, so it segments words never seen in training
    * exactly like the reference BPE encoder. For in-vocabulary corpora
    * it reproduces the training dictionary bit for bit (same rules,
    * same greedy application — spec-pinned). */
  private def applyMergeChain(syms: Column,
      merges: Seq[(String, String)]): Column =
    merges.foldLeft(syms) { case (s, (l, r)) => applyMerge(s, l, r) }

  /** Per-row piece count of `text` under the learned merges — narrow
    * (no join, no shuffle): split, per-word merge-chain fold, sum. */
  def segmentExpr(text: Column, merges: Seq[(String, String)]): Column =
    aggregate(
      filter(split(text, " "), w => length(w) > 0),
      lit(0L),
      (acc, w) => acc +
        size(applyMergeChain(charSyms(w), merges)).cast("long"))

  /** Read back what [[mergesDf]] wrote, in rank order. */
  def collectMerges(df: DataFrame): Seq[(String, String)] =
    df.orderBy(col("merge_rank")).collect()
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))).toSeq

  /** The shared serial-replay CTE chain (no `WITH`): the token instance
    * relation, the char-symbolized dictionary, then per round the
    * adjacency relation, pair counts, the argmax pair, run-parity match
    * selection and the dictionary rewrite. Ends at `w<numMerges>`. */
  private def bpeCtes(numMerges: Int): String = {
    val rounds = (1 to numMerges).map { r =>
      val p = r - 1
      s"""adj$p AS MATERIALIZED (
         SELECT word, cnt, i, s,
           lead(s) OVER (PARTITION BY word ORDER BY i) AS nx
         FROM (SELECT word, cnt, generate_subscripts(syms, 1) AS i,
                 unnest(syms) AS s FROM w$p)),
       b$r AS MATERIALIZED (
         SELECT s AS lhs, nx AS rhs, CAST(sum(cnt) AS BIGINT) AS c
         FROM adj$p WHERE nx IS NOT NULL GROUP BY s, nx
         ORDER BY c DESC, lhs, rhs LIMIT 1),
       kp$r AS MATERIALIZED (
         SELECT word, i FROM (
           SELECT word, i,
             row_number() OVER (PARTITION BY word, g ORDER BY i) AS rn
           FROM (SELECT a.word, a.i,
                   a.i - row_number() OVER (PARTITION BY a.word
                     ORDER BY a.i) AS g
                 FROM adj$p a, b$r b
                 WHERE a.s = b.lhs AND a.nx = b.rhs))
         WHERE rn % 2 = 1),
       w$r AS MATERIALIZED (
         SELECT a.word, a.cnt,
           list(CASE WHEN k.i IS NOT NULL THEN a.s || a.nx ELSE a.s END
                ORDER BY a.i) AS syms
         FROM adj$p a
         LEFT JOIN kp$r k ON k.word = a.word AND k.i = a.i
         LEFT JOIN kp$r k2 ON k2.word = a.word AND k2.i = a.i - 1
         WHERE k2.i IS NULL
         GROUP BY a.word, a.cnt)"""
    }.mkString(",\n")
    s"""toks AS MATERIALIZED (
         SELECT doc_id, t AS word FROM (
           SELECT doc_id, unnest(string_split(text, ' ')) AS t
           FROM documents)
         WHERE t <> ''),
       w0 AS MATERIALIZED (
         SELECT word, CAST(count(*) AS BIGINT) AS cnt,
           string_split(word, '') AS syms
         FROM toks GROUP BY word),
       $rounds"""
  }

  /** DuckDB oracle for [[mergesDf]]. */
  def mergesOracleSql(numMerges: Int): String = {
    val union = (1 to numMerges).map { r =>
      s"SELECT CAST($r AS BIGINT) AS merge_rank, lhs, rhs, c AS pair_count" +
        s" FROM b$r"
    }.mkString("\n UNION ALL ")
    s"""WITH ${bpeCtes(numMerges)}
       SELECT merge_rank, lhs, rhs, pair_count FROM ($union)
       ORDER BY merge_rank"""
  }

  /** DuckDB oracle for [[trainMergesBatched]] at ARBITRARY batchSize —
    * the k>1 path is deterministic, so its serial replay is expressible
    * as the same materialized-CTE chain [[mergesOracleSql]] uses, with
    * the per-round greedy admission unrolled: per round, rank the
    * round-start pair counts (row_number over (c DESC, lhs, rhs) — the
    * exact tie-break), admit up to `want = least(batchSize, remaining)`
    * pairs in rank order whose lhs, rhs AND fused product are untouched
    * by earlier admissions this round, scanning no further than the
    * 4*want over-fetch budget, then apply the admitted merges ONE AT A
    * TIME via the same run-parity kp/w rewrite (sequential application
    * is exactly [[applyMergeChain]]'s fold). Rounds unroll to numMerges
    * (worst case: every round admits only the argmax); exhausted rounds
    * admit nothing and copy the dictionary through unchanged. */
  def mergesBatchedOracleSql(numMerges: Int, batchSize: Int): String = {
    require(numMerges >= 1 && batchSize >= 1)
    def adjCte(s: Int) =
      s"""adj$s AS MATERIALIZED (
         SELECT word, cnt, i, s,
           lead(s) OVER (PARTITION BY word ORDER BY i) AS nx
         FROM (SELECT word, cnt, generate_subscripts(syms, 1) AS i,
                 unnest(syms) AS s FROM w$s))"""
    // run-parity rewrite of state s under the (0-or-1-row) pair CTE `p`
    def rewriteCtes(s: Int, p: String) =
      s"""kp${s + 1} AS MATERIALIZED (
         SELECT word, i FROM (
           SELECT word, i,
             row_number() OVER (PARTITION BY word, g ORDER BY i) AS rn
           FROM (SELECT a.word, a.i,
                   a.i - row_number() OVER (PARTITION BY a.word
                     ORDER BY a.i) AS g
                 FROM adj$s a, $p b
                 WHERE a.s = b.lhs AND a.nx = b.rhs))
         WHERE rn % 2 = 1),
       w${s + 1} AS MATERIALIZED (
         SELECT a.word, a.cnt,
           list(CASE WHEN k.i IS NOT NULL THEN a.s || a.nx ELSE a.s END
                ORDER BY a.i) AS syms
         FROM adj$s a
         LEFT JOIN kp${s + 1} k ON k.word = a.word AND k.i = a.i
         LEFT JOIN kp${s + 1} k2 ON k2.word = a.word AND k2.i = a.i - 1
         WHERE k2.i IS NULL
         GROUP BY a.word, a.cnt)"""
    val rounds = (1 to numMerges).map { r =>
      val s0 = (r - 1) * batchSize
      val steps = (1 to batchSize).map { j =>
        val s = s0 + j - 1
        val prevRn = if (j == 1) "0" else s"(SELECT max(rn) FROM adm${r}_${j - 1})"
        val stepAdj = if (j == 1) "" else adjCte(s) + ",\n       "
        s"""${stepAdj}adm${r}_$j AS MATERIALIZED (
           SELECT lhs, rhs, c, rn FROM rk$r
           WHERE $j <= (SELECT n FROM want$r)
             AND rn <= 4 * (SELECT n FROM want$r)
             AND rn > $prevRn
             AND lhs NOT IN (SELECT sym FROM used${r}_${j - 1})
             AND rhs NOT IN (SELECT sym FROM used${r}_${j - 1})
             AND lhs || rhs NOT IN (SELECT sym FROM used${r}_${j - 1})
           ORDER BY rn LIMIT 1),
         used${r}_$j AS (
           SELECT sym FROM used${r}_${j - 1}
           UNION ALL SELECT lhs FROM adm${r}_$j
           UNION ALL SELECT rhs FROM adm${r}_$j
           UNION ALL SELECT lhs || rhs FROM adm${r}_$j),
         ${rewriteCtes(s, s"adm${r}_$j")}"""
      }.mkString(",\n")
      val admCounts = (1 to batchSize)
        .map(j => s"(SELECT count(*) FROM adm${r}_$j)").mkString(" + ")
      s"""want$r AS MATERIALIZED (
         SELECT least($batchSize, $numMerges - (SELECT n FROM tot${r - 1})) AS n),
       ${adjCte(s0)},
       rk$r AS MATERIALIZED (
         SELECT lhs, rhs, c,
           row_number() OVER (ORDER BY c DESC, lhs, rhs) AS rn
         FROM (SELECT s AS lhs, nx AS rhs, CAST(sum(cnt) AS BIGINT) AS c
               FROM adj$s0 WHERE nx IS NOT NULL GROUP BY s, nx)),
       used${r}_0 AS (SELECT '' AS sym WHERE 1 = 0),
       $steps,
       tot$r AS MATERIALIZED (
         SELECT (SELECT n FROM tot${r - 1}) + $admCounts AS n)"""
    }.mkString(",\n")
    val union = (for (r <- 1 to numMerges; j <- 1 to batchSize) yield
      s"SELECT $r AS r, rn, lhs, rhs, c FROM adm${r}_$j").mkString("\n UNION ALL ")
    s"""WITH toks AS MATERIALIZED (
         SELECT doc_id, t AS word FROM (
           SELECT doc_id, unnest(string_split(text, ' ')) AS t
           FROM documents)
         WHERE t <> ''),
       w0 AS MATERIALIZED (
         SELECT word, CAST(count(*) AS BIGINT) AS cnt,
           string_split(word, '') AS syms
         FROM toks GROUP BY word),
       tot0 AS (SELECT 0 AS n),
       $rounds
       SELECT row_number() OVER (ORDER BY r, rn) AS merge_rank,
         lhs, rhs, c AS pair_count
       FROM ($union)
       ORDER BY merge_rank"""
  }

  /** DuckDB oracle for [[segmentCounts]] over the documents table. */
  def segmentOracleSql(numMerges: Int): String =
    s"""WITH ${bpeCtes(numMerges)}
       SELECT t.doc_id, CAST(sum(len(w.syms)) AS BIGINT) AS n_pieces
       FROM toks t JOIN w$numMerges w USING (word)
       GROUP BY t.doc_id ORDER BY t.doc_id"""

  /** DuckDB oracle for tokenizer-aware sequence packing: the
    * [[segmentCounts]] replay feeding the d13 packing arithmetic —
    * training budgets are measured in model tokens, so the packer's
    * length input is the learned tokenizer's piece count per document. */
  def tokenPackingOracleSql(numMerges: Int, budget: Int): String =
    s"""WITH ${bpeCtes(numMerges)},
       tl AS (SELECT t.doc_id, CAST(sum(len(w.syms)) AS BIGINT) AS n_tokens
              FROM toks t JOIN w$numMerges w USING (word)
              GROUP BY t.doc_id),
       pc AS (SELECT doc_id, n_tokens,
                CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS cum_before
              FROM tl)
       SELECT doc_id, n_tokens,
              CAST(floor(cum_before / $budget) AS BIGINT) AS seq_id,
              CAST(cum_before % $budget AS BIGINT) AS seq_offset
       FROM pc ORDER BY doc_id"""
}
