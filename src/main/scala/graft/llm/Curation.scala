package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation: the composed pipeline the individual operators
  * exist for — language identification, quality scoring, and exact-dup
  * keep-first filtering produce one per-document verdict. Each stage is a
  * narrow transform or a single keyed shuffle; the dedup stage partitions
  * by the md5 digest of the text (16 bytes), never by the text itself, so
  * the shuffle stays small no matter how long documents get.
  *
  * Decisions are made on the ROUNDED quality score (the published value),
  * so the verdict is reproducible across engines — filtering on the
  * unrounded double would let last-ulp noise flip borderline documents.
  */
object Curation {

  /** Per-document curation verdict.
    * Output: (doc_id, pred_lang, quality_score, is_dup_copy, kept).
    *
    * Language ID and the quality score are pure row-local expressions
    * ([[TextAnalysis.languageIdExpr]]/[[TextAnalysis.qualityScoreExpr]]),
    * so the whole verdict is ONE pass over the corpus whose only shuffle
    * is the exact-dup digest window — the previous formulation computed
    * the three verdict inputs as separate relations and re-joined them
    * on doc_id twice (two extra joins + two extra corpus scans for
    * row-local arithmetic Catalyst can evaluate in place).
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      minQuality: Double = 0.8,
      langs: Seq[String] = Seq("en", "es")): DataFrame =
    curateWithText(docs, idCol, textCol, minQuality, langs)
      .select(col("doc_id"), col("pred_lang"), col("quality_score"),
        col("is_dup_copy"), col("kept"))

  /** [[curate]] carrying the document text through (`__text`), so a
    * consumer that needs the kept documents' text (the packing stage of
    * [[pretrainingPipeline]]) reads it off the verdict relation instead
    * of re-joining the corpus. */
  private[llm] def curateWithText(docs: DataFrame, idCol: String,
      textCol: String, minQuality: Double,
      langs: Seq[String]): DataFrame = {
    val byDigest = Window.partitionBy(md5(col("__text")))
    docs
      .select(col(idCol).as("doc_id"), col(textCol).as("__text"),
        TextAnalysis.languageIdExpr(col(textCol)).as("pred_lang"),
        TextAnalysis.qualityScoreExpr(col(textCol)).as("quality_score"))
      .withColumn("is_dup_copy",
        col("doc_id") =!= min(col("doc_id")).over(byDigest))
      .withColumn("kept",
        col("quality_score") >= minQuality &&
          col("pred_lang").isin(langs: _*) && !col("is_dup_copy"))
      .select(col("doc_id"), col("pred_lang"), col("quality_score"),
        col("is_dup_copy"), col("kept"), col("__text"))
  }

  /** Sequence PACKING: the deterministic document stream (ordered by id)
    * is concatenated token-wise and cut into fixed `budget`-token
    * training sequences — the concat-and-chunk packing LLM training
    * pipelines run after curation. Each document reports the sequence
    * its first token lands in and its offset there.
    * Output: (doc_id, n_tokens, seq_id, seq_offset).
    *
    * Scale shape: the global prefix sum is TWO-LEVEL, not one global
    * window — documents group into id-range chunks of `chunkSize`, the
    * per-chunk token totals (a tiny relation, one row per chunk) get a
    * single-partition running sum, and each chunk then computes its
    * local prefix sums in parallel with the chunk's base offset added.
    * A naive `sum().over(orderBy(id))` would sort the entire corpus into
    * ONE partition; this shape's only serial step is over n/chunkSize
    * rows. Tokens are whitespace tokens ([[TextAnalysis.tokenCounts]]
    * ws_tokens), so any engine reproduces the cut points exactly.
    */
  private val ShuffleP = 2147483647L // 2^31 - 1, prime

  /** Seed-derived affine constants (a, b) of the shuffle permutation —
    * shared by [[shuffleRanks]] and the gate's oracle text so both
    * engines compute byte-identical keys. a in [1, P-1], b in [0, P-1];
    * P prime makes x -> (x*a + b) mod P a BIJECTION on [0, P), so
    * distinct document ids below P can never collide.
    */
  def shuffleConstants(seed: Long): (Long, Long) = {
    // splitmix64 finalizer: EVERY seed scatters before the constants
    // derive — a bare multiply left seed 0 at (a=1, b=0), the identity
    // permutation, exactly the monotone ordering a shuffle must avoid
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    val a = math.abs(z % (ShuffleP - 1)) + 1
    val b = math.abs((z * 0xC2B2AE3D27D4EB4FL) % ShuffleP)
    (a, b)
  }

  /** Deterministic corpus SHUFFLE for training order: every document
    * gets a pseudo-random but seed-reproducible global rank. The shuffle
    * key is the affine permutation ((doc_id mod P) * a + b) mod P with
    * [[shuffleConstants]] — exact integer arithmetic (the inner mod
    * keeps the product under 2^63 for any doc_id), so any engine
    * recomputes identical ranks. Output: (doc_id, shuffle_rank),
    * 0-based and dense.
    *
    * Scale shape: rank assignment is the same two-level trick as
    * [[packSequences]] — keys bucket into `nBuckets` ranges, per-bucket
    * counts (one row per bucket) take the only serial running sum, and
    * each bucket row_numbers locally in parallel with its base offset
    * added. No global single-partition sort.
    */
  def shuffleRanks(docs: DataFrame, idCol: String, seed: Long,
      nBuckets: Int = 1024): DataFrame = {
    require(nBuckets > 0)
    val P = ShuffleP
    val (a, b) = shuffleConstants(seed)
    // shared bucket-keyed exchange: per-bucket counts and the local rank
    // window both cluster by bucket (see packByLengths)
    val keyed = docs.select(col(idCol).cast("bigint").as("doc_id"))
      .withColumn("skey", ((col("doc_id") % P) * a + b) % P)
      .withColumn("bucket", floor(col("skey") / ((P / nBuckets) + 1)))
      .repartition(col("bucket"))
    val bucketBase = keyed.groupBy("bucket")
      .agg(count(lit(1)).as("n"))
      .withColumn("base", coalesce(sum(col("n")).over(
        Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("base"))
    val localWin = Window.partitionBy("bucket").orderBy("skey", "doc_id")
    keyed
      .withColumn("local_rank", row_number().over(localWin).cast("long") - 1)
      .join(bucketBase, "bucket")
      .select(col("doc_id"), (col("base") + col("local_rank")).as("shuffle_rank"))
  }

  /** Deterministic data MIXING: keep an EXACT target number of documents
    * per stratum (language, source domain, ...), chosen in seed-shuffled
    * order — the mixture-reweighting step a training pipeline runs after
    * curation ("200 B tokens web, 40 B code, ..."). Strata absent from
    * `targets` are dropped entirely; a target larger than the stratum
    * keeps the whole stratum. Output: (doc_id, stratum).
    *
    * Scale shape: the per-stratum rank does NOT window by stratum alone
    * (5 languages would mean 5 partitions — a skew cliff); shuffle keys
    * bucket into ranges, per-(stratum, bucket) counts take a running sum
    * over the tiny (strata x buckets) relation, and each (stratum,
    * bucket) cell row_numbers locally in parallel. Keys within bucket i
    * all precede bucket i+1's, so cell-local rank + bucket base IS the
    * stratum-global shuffled rank.
    */
  def mixCorpus(docs: DataFrame, idCol: String, strataCol: String,
      targets: Map[String, Long], seed: Long,
      nBuckets: Int = 1024): DataFrame = {
    require(targets.nonEmpty && nBuckets > 0)
    val P = ShuffleP
    val (a, b) = shuffleConstants(seed)
    val keyed = docs
      .select(col(idCol).cast("bigint").as("doc_id"),
        col(strataCol).as("stratum"))
      .filter(col("stratum").isin(targets.keys.toSeq: _*))
      .withColumn("skey", ((col("doc_id") % P) * a + b) % P)
      .withColumn("bucket", floor(col("skey") / ((P / nBuckets) + 1)))
      .repartition(col("stratum"), col("bucket"))
    val base = keyed.groupBy("stratum", "bucket")
      .agg(count(lit(1)).as("n"))
      .withColumn("cum_before", coalesce(sum(col("n")).over(
        Window.partitionBy("stratum").orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("stratum"), col("bucket"), col("cum_before"))
    val localWin = Window.partitionBy("stratum", "bucket")
      .orderBy("skey", "doc_id")
    val target = targets.foldLeft(lit(0L)) { case (acc, (s, k)) =>
      when(col("stratum") === s, k).otherwise(acc)
    }
    keyed
      .withColumn("local_rank", row_number().over(localWin).cast("long"))
      .join(base, Seq("stratum", "bucket"))
      .filter(col("cum_before") + col("local_rank") <= target)
      .select(col("doc_id"), col("stratum"))
  }

  /** Temperature-scaled (tau = 2) data mixing by TOKEN budget: each
    * stratum's share of `budget` tokens is proportional to
    * isqrt(stratum's total tokens) — the sqrt flattening that keeps
    * small domains represented (the classical multilingual/domain
    * temperature-sampling move) — with the integer remainder settled by
    * largest-remainder apportionment (ties toward the lexicographically
    * smaller stratum). Each stratum then keeps the longest PREFIX of
    * whole documents (doc_id order) whose token line fits the
    * allocation. isqrt is floor(sqrt(double)): IEEE sqrt is correctly
    * rounded, so the result is engine-identical for any BIGINT total,
    * and every other step is BIGINT — the mix is bit-reproducible.
    *
    * Scale: allocations live on the tiny per-stratum relation; the
    * per-document prefix sum is the [[packSequences]] two-level idiom
    * partitioned by (stratum, doc_id-chunk), so no stratum-wide ordered
    * window exists (the d15 lesson) and the single-partition windows
    * only ever see one row per chunk/stratum.
    *
    * Output: (doc_id, stratum, n_tokens) of kept documents.
    */
  def temperatureMix(docs: DataFrame, idCol: String, strataCol: String,
      tokenCol: String, budget: Long, chunkSize: Int = 4096): DataFrame = {
    require(budget > 0 && chunkSize > 0)
    // one (stratum, chunk)-keyed exchange shared by all three consumers:
    // per-(stratum, chunk) totals, the local prefix window, AND the
    // per-stratum totals (derived from the chunk totals — the sum of
    // per-chunk sums is the stratum sum, exact in BIGINT) — so the doc
    // relation is scanned and shuffled once instead of three times
    val perDoc = docs.select(col(idCol).cast("bigint").as("doc_id"),
      col(strataCol).as("stratum"),
      col(tokenCol).cast("long").as("n_tokens"))
      .withColumn("chunk", floor(col("doc_id") / chunkSize))
      .repartition(col("stratum"), col("chunk"))
    val chunkTotals = perDoc.groupBy("stratum", "chunk")
      .agg(sum(col("n_tokens")).as("chunk_w"))
    val totals = chunkTotals.groupBy("stratum")
      .agg(sum(col("chunk_w")).as("tw"))
      .withColumn("ws", expr(
        "CAST(floor(sqrt(CAST(tw AS DOUBLE))) AS BIGINT)"))
    val wsum = totals.agg(sum(col("ws")).as("wsum"))
    val alloc = totals.crossJoin(wsum)
      .withColumn("base_alloc", expr(s"($budget * ws) div wsum"))
      .withColumn("rem_key", expr(s"($budget * ws) % wsum"))
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("rem_key").desc, col("stratum"))).cast("long"))
      .withColumn("spare", lit(budget) -
        sum(col("base_alloc")).over(Window.partitionBy()))
      .withColumn("alloc",
        col("base_alloc") + when(col("rnk") <= col("spare"), 1L)
          .otherwise(0L))
      .select(col("stratum"), col("alloc"))
    val chunkBase = chunkTotals
      .withColumn("chunk_base",
        coalesce(sum(col("chunk_w")).over(
          Window.partitionBy("stratum").orderBy("chunk")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("stratum"), col("chunk"), col("chunk_base"))
    val localWin = Window.partitionBy("stratum", "chunk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    perDoc
      .withColumn("local_before",
        coalesce(sum(col("n_tokens")).over(localWin), lit(0L)))
      .join(chunkBase, Seq("stratum", "chunk"))
      .withColumn("cum_before", col("chunk_base") + col("local_before"))
      .join(broadcast(alloc), "stratum")
      .filter(col("cum_before") + col("n_tokens") <= col("alloc"))
      .select(col("doc_id"), col("stratum"), col("n_tokens"))
  }

  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      budget: Int, chunkSize: Int = 4096): DataFrame =
    packByLengths(docs.select(col(idCol),
        size(split(col(textCol), " ")).cast("long").as("n_tokens")),
      idCol, "n_tokens", budget, chunkSize)

  /** [[packSequences]] over PRECOMPUTED lengths — the tokenizer-aware
    * form: a real pipeline packs by the tokenizer's piece counts (e.g.
    * [[Bpe.segmentCounts]]), not whitespace counts, because the training
    * budget is measured in model tokens. Same two-level distributed
    * prefix sum; `lengths` is (idCol, lenCol). */
  def packByLengths(lengths: DataFrame, idCol: String, lenCol: String,
      budget: Int, chunkSize: Int = 4096): DataFrame = {
    require(budget > 0 && chunkSize > 0)
    // ONE explicit chunk-keyed exchange shared by BOTH consumers: the
    // per-chunk totals aggregate and the local prefix-sum window each
    // need the data clustered by chunk, and hashpartitioning(chunk)
    // satisfies both — so the (possibly expensive: text split at d13,
    // BPE segmentation at d26) upstream runs once into one shuffle that
    // the second leg picks up as a ReusedExchange, instead of two
    // independent scans each paying their own exchange.
    val perDoc = lengths.select(col(idCol).cast("bigint").as("doc_id"),
      col(lenCol).cast("long").as("n_tokens"))
      .withColumn("chunk", floor(col("doc_id") / chunkSize))
      .repartition(col("chunk"))
    // serial step over the tiny chunk relation only
    val chunkBase = perDoc.groupBy("chunk")
      .agg(sum(col("n_tokens")).as("chunk_tokens"))
      .withColumn("chunk_base",
        coalesce(sum(col("chunk_tokens")).over(
          Window.orderBy("chunk")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("chunk"), col("chunk_base"))
    val localWin = Window.partitionBy("chunk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    perDoc
      .withColumn("local_before",
        coalesce(sum(col("n_tokens")).over(localWin), lit(0L)))
      .join(chunkBase, "chunk")
      .withColumn("cum_before", col("chunk_base") + col("local_before"))
      .select(col("doc_id"), col("n_tokens"),
        floor(col("cum_before") / budget).as("seq_id"),
        (col("cum_before") % budget).as("seq_offset"))
  }

  /** Per-group frequency CAP (the CommonCrawl "domain cap"): keep at
    * most `cap` documents per group (source domain, license bucket,
    * ...), chosen as a deterministic seed-shuffled sample — the same
    * affine-mod-P key as [[shuffleRanks]], so the retained set is
    * bit-reproducible and re-derivable months later.
    *
    * Scale shape: NO per-group window (a handful of mega-domains would
    * each funnel through one reducer task for the sort). The bounded
    * [[graft.functions.Udafs.TopKByScore]] aggregator keeps a cap-row
    * buffer, so every map task emits a local cap-row sketch and the
    * shuffle merges sketches — per-group cost is O(cap), never the
    * group size. Output: (idCol, groupCol) for the kept documents.
    */
  def capPerGroup(docs: DataFrame, idCol: String, groupCol: String,
      cap: Int, seed: Long): DataFrame = {
    require(cap > 0)
    val P = ShuffleP
    val (a, b) = shuffleConstants(seed)
    val topk = org.apache.spark.sql.functions.udaf(
      new graft.functions.Udafs.TopKByScore(cap),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[(Double, Long)]())
    docs.select(col(idCol).cast("bigint").as("doc_id"),
        col(groupCol).as("grp"))
      .withColumn("skey", ((col("doc_id") % P) * a + b) % P)
      .groupBy("grp")
      // skey < 2^31 is exact in a double; negation turns the top-k
      // (desc) buffer into min-k by skey, ties to the smaller doc_id
      .agg(topk((-col("skey")).cast("double"), col("doc_id")).as("tk"))
      .select(col("grp"), explode(col("tk")).as("sn"))
      .select(col("sn._2").as(idCol), col("grp").as(groupCol))
  }

  /** Length-grouped batch packing: rank documents by (token count,
    * doc_id), cut the ranking into fixed-size batches of `batchSize`
    * documents, and report each batch's padding economics (a padded
    * batch costs `n_docs * max_tokens`; the waste is that minus the
    * real token sum). Sorting by length before batching is the standard
    * trick that collapses padding waste versus arrival-order batching —
    * this op both produces the assignment and QUANTIFIES the saving.
    *
    * Scale shape: the global (n_tokens, doc_id) rank is the two-level
    * idiom again — the only serial window runs over the tiny
    * one-row-per-distinct-length relation; each length group
    * row_numbers locally in parallel with its base added. No global
    * single-partition sort. Output: (batch_id, n_docs, max_tokens,
    * sum_tokens, padding_waste).
    */
  def lengthBatches(docs: DataFrame, idCol: String, textCol: String,
      batchSize: Int): DataFrame = {
    require(batchSize > 0)
    // one length-keyed exchange shared by the per-length counts and the
    // local rank window (both cluster by n_tokens): the text split runs
    // once into one shuffle instead of two independent scans
    val perDoc = docs.select(col(idCol).cast("bigint").as("doc_id"),
      size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .repartition(col("n_tokens"))
    val base = perDoc.groupBy("n_tokens")
      .agg(count(lit(1)).as("n"))
      .withColumn("base", coalesce(sum(col("n")).over(
        Window.orderBy("n_tokens")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("n_tokens"), col("base"))
    val localWin = Window.partitionBy("n_tokens").orderBy("doc_id")
    perDoc
      .withColumn("local_rank", row_number().over(localWin).cast("long") - 1)
      .join(base, "n_tokens")
      .withColumn("batch_id",
        floor((col("base") + col("local_rank")) / batchSize))
      .groupBy("batch_id")
      .agg(count(lit(1)).as("n_docs"), max("n_tokens").as("max_tokens"),
        sum("n_tokens").as("sum_tokens"))
      .withColumn("padding_waste",
        col("n_docs") * col("max_tokens") - col("sum_tokens"))
  }

  /** Probability-proportional-to-size SYSTEMATIC sample of exactly `k`
    * slots: lay the documents out on a token line in doc_id order
    * (exclusive prefix sum of `weightCol`, the [[packSequences]]
    * two-level idiom — no global ordered window), then take the k
    * equally-spaced positions `offset + j * stride` (stride = total/k,
    * offset an affine-mod-P mix of the seed reduced mod stride) and emit
    * the document whose interval [cum, cum+w) contains each position. A
    * document with w >= stride can legitimately win multiple slots —
    * that IS sampling with replacement proportional to size; inclusion
    * probability is w/stride for w < stride, the classical PPS
    * systematic design. Every step is BIGINT, so the draw is
    * bit-reproducible on any engine and any partitioning — a sampled
    * pretraining mix must be re-derivable months later.
    *
    * Slot assignment is JOIN-FREE: each row computes its covered slot
    * range arithmetically and explodes it, so the only shuffles are the
    * prefix sum's (per-chunk local window + tiny serial chunk-base sum)
    * and `total` is the lone driver-side scalar. At 100 TB nothing else
    * leaves the row: no positions broadcast, no interval join.
    *
    * Output: (slot, doc_id, weight) — exactly k rows, slots 0..k-1.
    */
  /** Corpus SNAPSHOT DIFF — the audit every versioned-dataset pipeline
    * runs between two corpus versions: which documents were added,
    * removed, changed, or untouched. Content comparison happens on the
    * md5 digest computed BEFORE the join, so the full-outer hash join
    * moves 16-byte digests keyed by id — the document text itself never
    * shuffles, which at 100 TB is the difference between a metadata-sized
    * exchange and re-shipping the corpus twice.
    * Output: (doc_id, status) with status in
    * {added, removed, changed, unchanged} (v1 -> v2 direction).
    */
  def snapshotDiff(v1: DataFrame, v2: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    def digests(df: DataFrame, name: String): DataFrame =
      df.select(col(idCol).cast("bigint").as("doc_id"),
        md5(col(textCol).cast("binary")).as(name))
    digests(v1, "d1").join(digests(v2, "d2"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("d1").isNull, "added")
          .when(col("d2").isNull, "removed")
          .when(col("d1") === col("d2"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** End-to-end pretraining-data pipeline: [[curate]]'s per-document
    * verdict (language ID + quality gate + exact keep-first dedup) feeds
    * the surviving document stream straight into [[packSequences]] —
    * the curate -> filter -> concat-and-pack chain an LLM training run
    * executes, composed as ONE declarative plan so Catalyst sees (and
    * the gate verifies) the whole thing end to end. The packing prefix
    * sum runs over the KEPT stream in doc_id order, exactly the order a
    * compacted corpus would concatenate in.
    *
    * Scale shape: inherits each stage's — narrow scoring transforms, one
    * digest-keyed shuffle for dedup, a semi-join-sized id filter, and the
    * two-level prefix sum (no global ordered window anywhere).
    * Output: (doc_id, n_tokens, seq_id, seq_offset) for kept docs only.
    */
  def pretrainingPipeline(docs: DataFrame, idCol: String, textCol: String,
      minQuality: Double = 0.8, langs: Seq[String] = Seq("en", "es"),
      budget: Int = 512, chunkSize: Int = 4096,
      materializeKept: Boolean = true): DataFrame = {
    // the fused verdict relation carries the text, so the kept stream
    // needs no join back to the corpus (one scan + one join saved)
    val joined = curateWithText(docs, idCol, textCol, minQuality, langs)
      .filter(col("kept"))
      .select(col("doc_id").cast("bigint").as("doc_id"), col("__text"))
    // the packing prefix sum consumes the kept stream TWICE (chunk-base
    // aggregation + local window); without a barrier Catalyst replays the
    // whole curation subtree once per branch. In production the kept
    // stream is a persisted table between the curation and packing jobs;
    // in-session, the slim bounded cache is that boundary (curation runs
    // once, both branches — and repeated invocations — read the blocks)
    val kept =
      if (materializeKept) Dedup.scopedCacheSlim(joined) else joined
    packSequences(kept, "doc_id", "__text", budget, chunkSize)
  }

  def ppsSystematicSample(docs: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: Long, chunkSize: Int = 4096): DataFrame = {
    require(k > 0 && chunkSize > 0)
    // shared chunk-keyed exchange (see packByLengths): totals aggregate
    // and prefix window both read one shuffle of the weight relation
    val raw = docs.select(col(idCol).cast("bigint").as("doc_id"),
      col(weightCol).cast("long").as("weight"))
      .withColumn("chunk", floor(col("doc_id") / chunkSize))
    val perDoc = raw.repartition(col("chunk"))
    val chunkBase = perDoc.groupBy("chunk")
      .agg(sum(col("weight")).as("chunk_w"))
      .withColumn("chunk_base",
        coalesce(sum(col("chunk_w")).over(
          Window.orderBy("chunk")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("chunk"), col("chunk_base"))
    val localWin = Window.partitionBy("chunk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val withCum = perDoc
      .withColumn("local_before",
        coalesce(sum(col("weight")).over(localWin), lit(0L)))
      .join(chunkBase, "chunk")
      .withColumn("cb", col("chunk_base") + col("local_before"))
    // driver-side scalar from the NARROW relation (map-side partial agg,
    // no exchange) — routing it through the repartitioned branch would
    // make this separate job pay a shuffle for one number
    val total = raw.agg(sum("weight")).head().getLong(0)
    require(total >= k, s"total weight $total < k=$k")
    val stride = total / k
    val P = 2147483647L
    val off = ((((seed % P) + P) % P) * 48271L % P + 11L) % P % stride
    withCum
      .withColumn("jlo", expr(
        s"CASE WHEN cb <= ${off}L THEN CAST(0 AS BIGINT) " +
          s"ELSE (cb - ${off}L + ${stride - 1}L) div ${stride}L END"))
      .withColumn("jhi", expr(
        s"least(CAST(${k - 1} AS BIGINT), CASE WHEN cb + weight - 1 < " +
          s"${off}L THEN CAST(-1 AS BIGINT) " +
          s"ELSE (cb + weight - 1 - ${off}L) div ${stride}L END)"))
      .filter(col("jlo") <= col("jhi"))
      .select(explode(expr("sequence(jlo, jhi)")).as("slot"),
        col("doc_id"), col("weight"))
  }
}
