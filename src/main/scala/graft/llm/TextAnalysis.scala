package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators: language ID, quality scoring, token counting,
  * document fingerprinting. All pure column expressions (codegen-friendly,
  * no UDFs), so they distribute trivially: narrow per-row transforms with no
  * shuffle at any scale.
  */
object TextAnalysis {

  /** Stopword markers per language. Deliberately tiny and deterministic —
    * the point is the operator shape (argmax over per-language evidence
    * scores), which is what a production n-gram model would also be.
    */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "ist", "das", "ein"),
    "es" -> Seq("el", "la", "que", "los", "una", "es"),
    "fr" -> Seq("le", "les", "et", "des", "une", "est"))

  private def score(words: Column, lang: String): Column =
    size(array_intersect(words, array(markers(lang).map(lit): _*)))

  /** Language-ID: distinct marker-word evidence per language + CJK script
    * detection, argmax with deterministic tie-break (en>de>es>fr).
    * Output: (id, pred_lang).
    */
  /** Row-local language-ID expression over a text column — exposed so
    * composed pipelines ([[Curation.curate]]) can evaluate it in place
    * instead of joining a separate relation. */
  private[llm] def languageIdExpr(txt: Column): Column = {
    val w = split(txt, " ")
    val en = score(w, "en"); val de = score(w, "de")
    val es = score(w, "es"); val fr = score(w, "fr")
    val hasCjk = txt.rlike("[\\u4e00-\\u9fff]")
    when(hasCjk, "zh")
      .when(en >= de && en >= es && en >= fr && en > 0, "en")
      .when(de >= es && de >= fr && de > 0, "de")
      .when(es >= fr && es > 0, "es")
      .when(fr > 0, "fr")
      .otherwise("und")
  }

  def languageId(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      languageIdExpr(col(textCol)).as("pred_lang"))

  /** Heuristic quality features + composite score.
    * Output: (doc_id, n_chars, n_tokens, avg_token_len, space_ratio,
    * quality_score). All ratios rounded for cross-engine comparability.
    */
  /** Row-local ROUNDED composite quality score over a text column (the
    * published decision value — see the object scaladoc of
    * [[Curation]]); exposed for in-place evaluation in composed
    * pipelines. */
  private[llm] def qualityScoreExpr(txt: Column): Column = {
    val nChars = length(txt)
    val nTokens = size(split(txt, " "))
    val nSpaces = nChars - length(regexp_replace(txt, " ", ""))
    val avgTok = (nChars - nSpaces).cast("double") / nTokens
    val spaceRatio = nSpaces.cast("double") / nChars
    // crude quality: enough tokens, sane token length, sane spacing
    val q = least(nTokens.cast("double") / lit(30.0), lit(1.0)) * lit(0.5) +
      when(avgTok.between(3.0, 8.0), 0.3).otherwise(0.0) +
      when(spaceRatio.between(0.1, 0.3), 0.2).otherwise(0.0)
    round(q, 4)
  }

  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val txt = col(textCol)
    val nChars = length(txt)
    val nTokens = size(split(txt, " "))
    val nSpaces = nChars - length(regexp_replace(txt, " ", ""))
    val avgTok = (nChars - nSpaces).cast("double") / nTokens
    val spaceRatio = nSpaces.cast("double") / nChars
    docs.select(col(idCol).as("doc_id"), nChars.as("n_chars"),
      nTokens.as("n_tokens"), round(avgTok, 4).as("avg_token_len"),
      round(spaceRatio, 4).as("space_ratio"),
      qualityScoreExpr(txt).as("quality_score"))
  }

  /** Token counts: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs / digit runs / single other chars).
    * Output: (doc_id, ws_tokens, bpe_tokens).
    * regexp_count counts matches without materializing the token array
    * (regexp_extract_all would allocate every token per row only to take
    * its size — pure garbage pressure at corpus scale).
    */
  /** Canonical text normalization for dedup/fingerprint preprocessing:
    * lowercase, non-alphanumerics to spaces, whitespace runs collapsed,
    * ends trimmed — every step an engine-independent string function, so
    * normalized text (and everything keyed on it downstream) is
    * bit-reproducible across engines. Pure per-row narrow transform.
    * Output: (doc_id, norm_text, n_chars_norm).
    */
  def normalizeText(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val norm = trim(regexp_replace(regexp_replace(lower(col(textCol)),
      "[^a-z0-9 ]", " "), " +", " "))
    docs.select(col(idCol).as("doc_id"), norm.as("norm_text"),
      length(norm).as("n_chars_norm"))
  }

  /** Fixed-window token CHUNKING with stride — the window split an
    * embedding/RAG pipeline runs before encoding: chunk c covers tokens
    * [c*stride, c*stride + window). The last chunk is the first one
    * whose window reaches the document's end (chunk count =
    * 1 + max(0, ceil((n - window) / stride))), so every token is
    * covered and no chunk is fully contained in an earlier one.
    * Entirely per-row (split + explode of a computed sequence) — no
    * shuffle, no state; chunk counts scale with document length, never
    * corpus size.
    * Output: (doc_id, chunk_id, start_token, n_tokens, chunk_text).
    */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      "need 0 < stride <= window")
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("w"))
      .withColumn("n", size(col("w")))
      .select(col("doc_id"), col("w"), col("n"),
        explode(expr("sequence(0, greatest(0, cast(ceil(" +
          s"(n - $window) / cast($stride as double)) as int)))"))
          .as("chunk_id"))
      .withColumn("start_token", col("chunk_id") * stride)
      .withColumn("n_tokens",
        least(lit(window), col("n") - col("start_token")))
      .select(col("doc_id"), col("chunk_id"), col("start_token"),
        col("n_tokens"),
        array_join(slice(col("w"), col("start_token") + 1,
          col("n_tokens")), " ").as("chunk_text"))
  }

  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      size(split(col(textCol), " ")).as("ws_tokens"),
      expr(s"regexp_count($textCol, '[a-z]+|[0-9]+|[^a-z0-9 ]')")
        .cast("int").as("bpe_tokens"))

  /** Polynomial rolling-hash fingerprint over the character stream,
    * mod 1e9+7 (stays in exact integer range, so any engine that folds
    * left-to-right produces the identical value). Uses the native
    * codegen expression (graft.functions.RollingHash) — one fused loop
    * per row instead of an array allocation + interpreted lambda per
    * character. Output: (doc_id, fingerprint).
    */
  /** Corpus vocabulary: the k most frequent whitespace tokens with a
    * deterministic tie-break (count desc, token asc). One explode + one
    * hash aggregation with map-side combine; the final top-k is
    * TakeOrderedAndProject over the (tiny) per-token count relation —
    * no global sort of the token stream at any scale.
    */
  def vocabularyTopK(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(k)

  /** Encode the corpus to TOKEN IDS against a frequency-built
    * vocabulary — the materialization step between vocabulary mining
    * ([[vocabularyTopK]]) and sequence packing ([[Curation
    * .packSequences]]): ids are dense ranks over the top `vocabSize`
    * tokens by (freq DESC, token) — fully deterministic — and
    * out-of-vocabulary tokens map to 0 (the UNK convention). Output is
    * the FLAT (doc_id, pos, token_id) relation (pos is the 1-based
    * token position): flat rows keep the result engine-comparable and
    * downstream array assembly is a cheap collect_list when a consumer
    * wants it.
    *
    * Scale: the vocabulary is `vocabSize` rows — built with one
    * aggregation and broadcast back; encoding is then a per-row
    * explode + broadcast join, so the corpus never shuffles. This is
    * the same static-side/stream-side split as the ANN indexes: build
    * the vocab once, encode any number of batches against it.
    */
  def encodeTokenIds(docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    val vocab = vocabularyTopK(docs, textCol, vocabSize)
      .withColumn("token_id",
        row_number().over(Window.orderBy(col("freq").desc, col("token")))
          .cast("long"))
      .select(col("token"), col("token_id"))
    docs.select(col(idCol).cast("bigint").as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("p", "token")))
      .filter(length(col("token")) > 0)
      .select(col("doc_id"), (col("p") + 1).cast("long").as("pos"),
        col("token"))
      .join(broadcast(vocab), Seq("token"), "left")
      .select(col("doc_id"), col("pos"),
        coalesce(col("token_id"), lit(0L)).as("token_id"))
  }

  /** Benchmark decontamination: per evaluation document, how many of its
    * distinct word n-grams also occur anywhere in the training corpus
    * (the standard n-gram-overlap contamination check run before
    * training). Both sides reduce to DISTINCT shingle relations joined on
    * the 64-bit shingle hash — a semi-join-shaped equality join, no
    * text×text comparison; the corpus side aggregates to distinct
    * shingles once and is reused for every eval doc.
    * Output: (doc_id, n_shingles, n_contaminated, contamination_ratio).
    */
  def contamination(corpus: DataFrame, eval_ : DataFrame, idCol: String,
      textCol: String, ngram: Int = 3): DataFrame = {
    val corpusSh = Dedup.shingles(corpus, idCol, textCol, ngram)
      .select(xxhash64(col("shingle")).as("h")).distinct()
    val evalSh = Dedup.shingles(eval_, idCol, textCol, ngram)
      .select(col("doc_id"), xxhash64(col("shingle")).as("h"))
    evalSh
      .join(corpusSh.withColumn("hit", lit(1)), Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        count(col("hit")).as("n_contaminated"))
      .withColumn("contamination_ratio",
        round(col("n_contaminated") / col("n_shingles"), 4))
  }

  /** [[contamination]] with a broadcast bloom-filter pre-filter — the
    * 100 TB shape. The EVAL side's distinct shingles (benchmarks: small)
    * build a bloom filter that broadcasts to every executor and prunes
    * the CORPUS side's distinct-shingle relation BEFORE the join; blooms
    * have no false negatives and the exact join removes false positives,
    * so the output is IDENTICAL to the exact path while the corpus-side
    * join input shrinks from |corpus shingles| to ~|eval shingles| — the
    * difference between shuffling terabytes of training shingles and
    * megabytes of candidates. The probe is a codegen'd native expression
    * ([[graft.functions.BloomMightContain]]) so the corpus-side scan —
    * the hottest path of the whole operator — stays inside whole-stage
    * codegen instead of crossing a UDF boundary per row.
    */
  def contaminationBloom(corpus: DataFrame, eval_ : DataFrame,
      idCol: String, textCol: String, ngram: Int = 3,
      fpp: Double = 0.01): DataFrame = {
    val spark = corpus.sparkSession
    val corpusSh = Dedup.shingles(corpus, idCol, textCol, ngram)
      .select(xxhash64(col("shingle")).as("h")).distinct()
    val evalSh = Dedup.shingles(eval_, idCol, textCol, ngram)
      .select(col("doc_id"), xxhash64(col("shingle")).as("h"))
    // cached across the TWO eager passes over it (the sizing count and
    // the bloom build) — uncached, the shingle+distinct subtree would
    // execute twice. The bounded scopedCache LRU (not a transient
    // persist/unpersist pair) keeps the lifecycle managed while letting
    // a repeated call reuse the relation instead of re-deriving the
    // eval shingles from the corpus scan for every invocation.
    val evalDistinct = Dedup.scopedCache(evalSh.select("h").distinct())
    // the count job runs on the SMALL side only; it sizes the filter
    val n = math.max(1L, evalDistinct.count())
    val bf = evalDistinct.stat.bloomFilter("h", n, fpp)
    val bcast = spark.sparkContext.broadcast(bf)
    val candidates =
      corpusSh.filter(graft.functions.BloomMightContain.probe(col("h"), bcast))
    evalSh
      .join(candidates.withColumn("hit", lit(1)), Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        count(col("hit")).as("n_contaminated"))
      .withColumn("contamination_ratio",
        round(col("n_contaminated") / col("n_shingles"), 4))
  }

  /** Corpus-side decontamination FILTER — the removal direction of
    * [[contamination]]: for every TRAINING document, the fraction of its
    * distinct n-gram shingles that appear anywhere in the eval set, and
    * the keep verdict (ratio <= `maxOverlap`). This is the direction a
    * production run executes — t06 reports per-eval-doc leakage, this op
    * actually cleans the corpus before training.
    *
    * Scale shape: per-document shingle TOTALS are computed in-row
    * (size(array_distinct(...)) — no explode, no shuffle), so the only
    * shuffled relation is the bloom-surviving candidate hits: the eval
    * side's distinct shingles (benchmarks: small) broadcast as a bloom
    * filter whose codegen'd probe ([[graft.functions.BloomMightContain]])
    * prunes the exploded corpus shingles BEFORE the exact semi-join —
    * no false negatives, false positives die in the join, so the output
    * is exact while the corpus-side shuffle shrinks from |corpus
    * shingles| to ~|hits|.
    * Output: (doc_id, n_shingles, n_hits, overlap_ratio, keep).
    */
  def decontaminateCorpus(corpus: DataFrame, eval_ : DataFrame,
      idCol: String, textCol: String, ngram: Int = 3,
      maxOverlap: Double = 0.5, fpp: Double = 0.01): DataFrame = {
    val spark = corpus.sparkSession
    val w = split(col(textCol), " ")
    // in-row distinct-shingle count, matching Dedup.shingles exactly
    // (docs under ngram words have zero shingles, not sequence(0,-1))
    val nShingles = when(size(w) >= ngram, size(array_distinct(expr(
      s"transform(sequence(0, size(split($textCol, ' '))-$ngram), " +
        s"i -> xxhash64(slice(split($textCol, ' '), i+1, $ngram)))"))))
      .otherwise(0).cast("long")
    val base = corpus.select(col(idCol).as("doc_id"),
      nShingles.as("n_shingles"))
    // cached across the sizing count, the bloom build AND the exact
    // verify join below — via the bounded scopedCache LRU (a bare
    // .persist() pinned one entry per call with no lifecycle owner)
    val evalSh = Dedup.scopedCache(Dedup.shingles(eval_, idCol, textCol,
      ngram).select(col("shingle")).distinct())
    val n = math.max(1L, evalSh.count())
    val bf = evalSh.stat.bloomFilter("shingle", n, fpp)
    val bcast = spark.sparkContext.broadcast(bf)
    val hits = Dedup.shingles(corpus, idCol, textCol, ngram)
      .filter(graft.functions.BloomMightContain.probe(col("shingle"), bcast))
      .join(evalSh, "shingle")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    base.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      // explicit zero-shingle branch: ANSI mode makes x/0 an ERROR, not
      // null — a sub-ngram-length doc must score 0, not kill the job
      .withColumn("overlap_ratio", when(col("n_shingles") === 0, 0.0)
        .otherwise(round(col("n_hits") / col("n_shingles"), 4)))
      .withColumn("keep", col("overlap_ratio") <= maxOverlap)
  }

  /** Grouped corpus MANIFEST — the dataset-card rollup every corpus
    * release ships: per group (source x language, ...) document count,
    * token and character totals, mean and exact median tokens per doc.
    * One hash aggregation over per-row narrow stats; the exact
    * percentile funnels one long per row into the grouped buffer (swap
    * for approx_percentile at 100 TB — same plan, mergeable sketch).
    * Output: (groupCols..., n_docs, total_tokens, total_chars,
    * avg_tokens, p50_tokens).
    */
  def corpusManifest(docs: DataFrame, textCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "manifest needs at least one group column")
    val nTokens = size(split(col(textCol), " ")).cast("long")
    docs.select(groupCols.map(col) :+ nTokens.as("n_tokens") :+
        length(col(textCol)).cast("long").as("n_chars"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"),
        round(avg(col("n_tokens")), 4).as("avg_tokens"),
        expr("percentile(n_tokens, 0.5)").as("p50_tokens"))
  }

  /** Deterministic hash-based train/eval split: a document's split is a
    * pure function of its id (first byte of md5 of the decimal id string
    * against a 0-255 threshold), so the split is reproducible across
    * engines, runs and cluster sizes, and re-running over grown data
    * never moves an old document between splits — the property that
    * keeps eval sets uncontaminated as corpora are re-snapshotted.
    * evalFraction is approximated as ceil(256·f)/256.
    */
  def trainEvalSplit(docs: DataFrame, idCol: String,
      evalFraction: Double): DataFrame = {
    require(evalFraction >= 0 && evalFraction <= 1)
    val cut = math.ceil(evalFraction * 256).toInt
    docs.withColumn("split",
      when(conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 2),
        16, 10).cast("int") < cut, "eval").otherwise("train"))
  }

  /** Gopher-style repetition signals per document (Rae et al. 2021, the
    * "repetitious text" filters): fraction of word occurrences that are
    * repeats of a word already seen in the document, same for word
    * bigrams, and the single most frequent word's share of the document.
    * High values mark boilerplate/spam for curation filters.
    *
    * The duplicate fractions are computed NARROWLY inside each row
    * (array_distinct over the word/bigram arrays — no explode, no
    * shuffle); only the top-word share needs per-(doc, word) counts, one
    * explode + hash aggregation with map-side combine, re-joined on
    * doc_id. Output: (doc_id, dup_word_frac, dup_bigram_frac,
    * top_word_share), ratios rounded for cross-engine comparability.
    */
  def repetitionSignals(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      split(col(textCol), " ").as("w"))
    val nW = size(col("w"))
    val narrow = base.select(col("doc_id"), col("w"),
      round((nW - size(array_distinct(col("w")))).cast("double") / nW, 4)
        .as("dup_word_frac"))
      // ANSI mode (Spark 4 default) throws on out-of-bounds array access,
      // so the bigram window must not be formed for single-word docs
      .withColumn("bi", expr(
        """case when size(w) >= 2
             then transform(sequence(0, size(w)-2), i -> concat(w[i], ' ', w[i+1]))
             else array() end"""))
      .select(col("doc_id"), col("dup_word_frac"),
        when(size(col("bi")) > 0,
          round((size(col("bi")) - size(array_distinct(col("bi"))))
            .cast("double") / size(col("bi")), 4))
          .otherwise(lit(0.0)).as("dup_bigram_frac"))
    val topShare = base
      .select(col("doc_id"), explode(col("w")).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(round(max(col("c")).cast("double") / sum(col("c")), 4)
        .as("top_word_share"))
    narrow.join(topShare, "doc_id")
  }

  /** PII redaction (emails, IPv4 addresses, phone-shaped digit runs):
    * the standard pre-training scrub pass. Pure `regexp_replace` /
    * `regexp_count` column expressions — codegen'd, narrow, no shuffle,
    * so the pass costs one scan at any corpus size. Matches are counted
    * stage-by-stage on the already-redacted text of the previous stage
    * (emails -> IPs -> phones), so a digit run inside an email or an IP
    * is never double-counted as a phone number. Patterns stay within the
    * common subset of Java regex and RE2 (no backrefs, no lookaround) so
    * the operator is reproducible against RE2-based engines.
    * Output: (doc_id, n_emails, n_ips, n_phones, redacted).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val PhoneRe = "\\+?[0-9][0-9 -]{6,}[0-9]"

  def redactPii(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, EmailRe, "[EMAIL]")
    val t2 = regexp_replace(t1, Ipv4Re, "[IP]")
    val t3 = regexp_replace(t2, PhoneRe, "[PHONE]")
    docs.select(col(idCol).as("doc_id"),
      regexp_count(t0, lit(EmailRe)).cast("int").as("n_emails"),
      regexp_count(t1, lit(Ipv4Re)).cast("int").as("n_ips"),
      regexp_count(t2, lit(PhoneRe)).cast("int").as("n_phones"),
      t3.as("redacted"))
  }

  /** Unigram-LM rarity statistics (the CCNet-style perplexity proxy):
    * per document, the fraction of word occurrences outside the top-k
    * corpus vocabulary and the median corpus frequency of its words. Low
    * median frequency / high OOV fraction marks gibberish and boilerplate
    * the quality-score heuristics miss. Two shuffles total at any scale:
    * the corpus word-frequency aggregate (map-side combined) and the
    * per-document re-aggregate; the top-k vocabulary relation is k rows
    * and broadcast. The frequency join is a build-side-tiny hash join on
    * the word key — frequent words make the probe side skewed but the
    * per-row payload is 8 bytes, and exact medians are the point here
    * (the approximate profile lives in [[corpusProfile]]).
    * Output: (doc_id, n_words, oov_frac, median_word_freq).
    */
  /** BM25 relevance of every document against a fixed bag-of-words query
    * — the retrieval scorer data-curation pipelines use to mine
    * domain-relevant training documents (query = a topic's seed terms).
    * IDF is the Robertson–Spärck Jones form `ln(1 + (N - df + 0.5) /
    * (df + 0.5))`; the per-term saturation uses the standard (k1, b)
    * length normalization.
    *
    * Scale shape: one exploded-word relation feeds three hash
    * aggregations — per-document length, per-(doc, term) term frequency
    * over the query-filtered words (the filter prunes the corpus to
    * query-term rows BEFORE any shuffle), and per-term document
    * frequency; N and avgdl are a two-value broadcast. No windows, no
    * UDFs — the scoring expression is codegen'd arithmetic. Documents
    * containing no query term score 0 and are not emitted.
    * Output: (doc_id, bm25).
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val words = docs.select(col(idCol).cast("bigint").as("doc_id"),
      explode(expr(s"filter(split($textCol, ' '), w -> w != '')")).as("word"))
    val dl = words.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val qw = words.filter(col("word").isInCollection(terms))
    // document frequency derives from the tf relation (its rows ARE the
    // distinct (doc, word) pairs) instead of re-exploding the corpus for
    // a second distinct+count pass; the explicit word-keyed exchange is
    // shared by the df aggregation and the scoring join's probe side, so
    // the query-filtered explode runs once
    val tf = qw.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      .repartition(col("word"))
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "word")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("contrib", expr(
        s"ln(1 + (n_docs - df + 0.5) / (df + 0.5)) * tf * ($k1 + 1) " +
          s"/ (tf + $k1 * (1 - $b + $b * dl / avgdl))"))
      .groupBy("doc_id").agg(round(sum(col("contrib")), 4).as("bm25"))
  }

  /** DSIR-style importance weights (Xie et al., "Data Selection for
    * Language Models via Importance Resampling"): score every raw-corpus
    * document by how much more likely its words are under a TARGET
    * domain's unigram bag-of-words model than under the raw corpus's own
    * model. weight(doc) = sum over word occurrences of
    * `ln p_target(w) - ln p_raw(w)` with additive-alpha smoothing over
    * the union vocabulary; top-weight documents are the ones to keep when
    * mining domain-relevant training data (the importance-resampling
    * step samples proportional to exp(weight)).
    *
    * Scale shape: two word-count hash aggregations (raw and target), a
    * full outer join into one log-ratio table, and a per-document
    * sum-join — the ratio table is vocabulary-sized, which
    * `hashBuckets = Some(m)` caps at m rows by hashing words to buckets
    * (the paper's hashed n-gram features; collisions merge counts, an
    * accepted approximation at scale). The scalar totals (N_raw,
    * N_target, |V|) ride along as a broadcast. All arithmetic is
    * codegen'd ln/sum — no UDFs. Output: (doc_id, dsir_logw), log
    * weights rounded to 4 places.
    */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, alpha: Double = 0.5,
      hashBuckets: Option[Int] = None): DataFrame = {
    def feats(df: DataFrame) = {
      val w = df.select(col(idCol).cast("bigint").as("doc_id"),
        explode(expr(s"filter(split($textCol, ' '), w -> w != '')"))
          .as("word"))
      hashBuckets.fold(w.withColumnRenamed("word", "f"))(m =>
        w.select(col("doc_id"), pmod(xxhash64(col("word")), lit(m)).as("f")))
    }
    // per-(doc, feature) counts first: the corpus totals derive from
    // them map-side-combined, and the final scoring join/shuffle moves
    // one row per DISTINCT (doc, feature) instead of one per occurrence.
    // The explicit feature-keyed exchange is SHARED by its two consumers
    // (the raw-model aggregation and the scoring join both cluster by
    // f), so the corpus explode+aggregate runs once into one shuffle the
    // second leg reads as a ReusedExchange — uncached, the whole docFeat
    // subtree executed twice.
    val docFeat = feats(raw).groupBy("doc_id", "f")
      .agg(count(lit(1)).as("c"))
      .repartition(col("f"))
    val rawCnt = docFeat.groupBy("f").agg(sum(col("c")).as("cr"))
    val tgtCnt = feats(target).groupBy("f").agg(count(lit(1)).as("ct"))
    val vocab = rawCnt.join(tgtCnt, Seq("f"), "full_outer")
      .select(col("f"), coalesce(col("cr"), lit(0L)).as("cr"),
        coalesce(col("ct"), lit(0L)).as("ct"))
    val stats = vocab.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"),
      count(lit(1)).as("v"))
    val logRatio = vocab.crossJoin(broadcast(stats))
      .select(col("f"), expr(
        s"ln((ct + $alpha) / (nt + $alpha * v)) - " +
          s"ln((cr + $alpha) / (nr + $alpha * v))").as("lr"))
    docFeat.join(logRatio, "f")
      .groupBy("doc_id")
      .agg(round(sum(col("lr") * col("c")), 4).as("dsir_logw"))
  }

  /** Percentile-band filter over a per-document score column — the
    * heavy-tail trimming step of quality filtering: drop the lowest and
    * highest score percentiles, keep the middle band (outliers at both
    * ends are usually boilerplate/gibberish or degenerate near-empty
    * docs). Exact percentile (`approx = false`) funnels one double per
    * row into a single aggregation — fine into the billions of rows; at
    * 100 TB set `approx = true` for approx_percentile, the same plan
    * with a mergeable map-side-combined sketch instead (rank error
    * bounded by 1/accuracy). The two bounds ride along as a one-row
    * broadcast; the filter itself is a narrow scan.
    */
  def scoreBandFilter(scored: DataFrame, scoreCol: String, loPct: Double,
      hiPct: Double, approx: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(loPct >= 0 && hiPct <= 1 && loPct <= hiPct,
      s"bad percentile band [$loPct, $hiPct]")
    val pct = if (approx)
      expr(s"approx_percentile($scoreCol, array($loPct, $hiPct), $accuracy)")
    else expr(s"percentile($scoreCol, array($loPct, $hiPct))")
    val bounds = scored.agg(pct.as("b"))
      .select(col("b").getItem(0).as("lo"), col("b").getItem(1).as("hi"))
    scored.crossJoin(broadcast(bounds))
      .filter(col(scoreCol).between(col("lo"), col("hi")))
      .drop("lo", "hi")
  }

  /** EXACT heavy hitters without shuffling the word stream: every token
    * whose corpus frequency exceeds total/k, via the classic two-phase
    * distributed pattern — (1) per-partition Misra–Gries summaries with
    * k counters emit a CANDIDATE set that provably contains every global
    * heavy hitter (if freq(x) > n/k globally then freq_p(x) > n_p/k in
    * at least one partition, else summing the per-partition bounds gives
    * freq(x) <= n/k; per-partition MG with k counters keeps everything
    * above its partition's n_p/k), then (2) an exact recount of the
    * candidates only. The only shuffle moves candidate counts (at most
    * k * partitions rows); the threshold compare is exact integer
    * arithmetic (freq * k > n), so the output EQUALS the exact
    * HAVING-count query a single-node engine runs. The full word-count
    * aggregation this replaces shuffles one row per distinct token —
    * at web-corpus vocabulary sizes that is the difference between a
    * bounded sketch merge and a vocabulary-wide exchange.
    * Output: (word, freq), freq > n_words / k.
    */
  def heavyHitters(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 1, "heavy-hitter threshold needs k > 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs.select(
      explode(expr(s"filter(split($textCol, ' '), w -> w != '')"))
        .as("word"))
    val candidates = words.as[String].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { w =>
        counters.get(w) match {
          case Some(c) => counters(w) = c + 1
          case None if counters.size < k => counters(w) = 1L
          case None => // decrement-all step: drop zeroed counters
            val keys = counters.keys.toArray
            var i = 0
            while (i < keys.length) {
              val v = counters(keys(i)) - 1
              if (v == 0) counters.remove(keys(i)) else counters(keys(i)) = v
              i += 1
            }
        }
      }
      counters.keysIterator
    }.toDF("word").distinct()
    val total = words.agg(count(lit(1)).as("n"))
    words.join(broadcast(candidates), "word")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .crossJoin(broadcast(total))
      .filter(col("freq") * k > col("n"))
      .select(col("word"), col("freq"))
  }

  /** Bigram-LM perplexity scoring — the CCNet-style "perplexity filter"
    * of data curation: estimate a smoothed bigram language model from a
    * reference corpus, score every candidate document by its
    * per-bigram average log-probability, and keep the docs the model
    * finds natural (low perplexity ≈ fluent text; degenerate or
    * gibberish docs sit in the high-perplexity tail). The model is
    * `P(w2|w1) = (c(w1,w2) + a) / (c(w1·) + a·V)` with context counts
    * `c(w1·)` = bigrams starting with w1 and V = the successor
    * vocabulary size; additive-a smoothing keeps unseen bigrams (and
    * unseen contexts: `ln(1/V)`) finite.
    *
    * Scale shape: bigrams explode per row from the token array (no
    * self-join), the model is two hash aggregations over the TRAIN
    * corpus, scoring is one equality join keyed on the bigram plus a
    * per-doc average — the same join/aggregate skeleton as
    * [[dsirWeights]]. All arithmetic is codegen'd ln/exp.
    * Output: (doc_id, n_bigrams, avg_logp, ppl), rounded to 4.
    */
  def bigramPerplexity(train: DataFrame, toScore: DataFrame, idCol: String,
      textCol: String, alpha: Double = 0.5): DataFrame = {
    def bigrams(df: DataFrame) = df
      .select(col(idCol).cast("bigint").as("doc_id"),
        expr(s"filter(split($textCol, ' '), w -> w != '')").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 1), " +
          "i -> named_struct('w1', w[i-1], 'w2', w[i]))")).as("b"))
      .select(col("doc_id"), col("b.w1"), col("b.w2"))
    val tb = bigrams(train)
    // ONE explode pass builds the distinct-bigram counts; the context
    // totals (cw = occurrences starting with w1 = sum of cb over w2)
    // and the successor vocabulary (distinct w2 over occurrences ==
    // distinct w2 over distinct bigrams) then derive from that much
    // smaller cached relation instead of re-exploding the corpus —
    // the uncached formulation ran the bigram explode three times for
    // the model alone
    val big = Dedup.scopedCache(
      tb.groupBy("w1", "w2").agg(count(lit(1)).as("cb")))
    val ctx = big.groupBy("w1").agg(sum(col("cb")).as("cw"))
    val stats = big.agg(countDistinct(col("w2")).as("v"))
    // per-(doc, bigram) counts first (the dsirWeights move): the model
    // join and the per-doc shuffle carry one row per DISTINCT bigram
    // per doc instead of one per occurrence
    bigrams(toScore).groupBy("doc_id", "w1", "w2")
      .agg(count(lit(1)).as("c"))
      .join(big, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .crossJoin(broadcast(stats))
      .withColumn("lp", expr(
        s"ln((coalesce(cb, 0) + $alpha) / (coalesce(cw, 0) + $alpha * v))"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_bigrams"),
        (sum(col("lp") * col("c")) / sum(col("c"))).as("alp"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("alp"), 4).as("avg_logp"),
        round(exp(-col("alp")), 4).as("ppl"))
  }

  def lexicalRarity(docs: DataFrame, idCol: String, textCol: String,
      topK: Int = 100): DataFrame = {
    val words = docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
    val freq = words.groupBy("word").agg(count(lit(1)).as("freq"))
    val top = freq.orderBy(col("freq").desc, col("word")).limit(topK)
      .select(col("word"), lit(1).as("in_top"))
    words
      .join(freq, "word")
      .join(broadcast(top), Seq("word"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        round(sum(when(col("in_top").isNull, 1).otherwise(0)).cast("double")
          / count(lit(1)), 4).as("oov_frac"),
        round(median(col("freq")), 1).as("median_word_freq"))
  }

  /** Deterministic stratified sampling: per-stratum keep rates, with the
    * keep decision a pure function of the row id (same md5-byte trick as
    * [[trainEvalSplit]]), so samples are reproducible across engines and
    * cluster sizes and never resample old rows as the corpus grows. This
    * is how a curation run downsamples over-represented languages or
    * sources without a shuffle: the filter is a narrow per-row predicate.
    * Rates are approximated as ceil(256·r)/256.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    def cut(r: Double): Int = { require(r >= 0 && r <= 1); math.ceil(r * 256).toInt }
    val bucket = conv(substring(md5(col(idCol).cast("string").cast("binary")),
      1, 2), 16, 10).cast("int")
    val threshold = rates.foldLeft(lit(cut(defaultRate))) {
      case (acc, (stratum, r)) =>
        when(col(strataCol) === stratum, cut(r)).otherwise(acc)
    }
    df.filter(bucket < threshold)
  }

  /** Character-class histogram: per document, occurrence counts of the
    * 8 ascii-mod-8 byte classes — the text-side twin of the multimodal
    * byte-histogram feature (Multimodal.extractFeatures), exact and
    * integer-valued so it can be oracle-pinned. Computed entirely in-row
    * (one filter per bucket over the char array — no explode, no
    * shuffle). Output: (doc_id, b0..b7).
    *
    * Unicode caveat: splitting on the empty pattern iterates UTF-16 code
    * UNITS, so a non-BMP character (outside U+0000..U+FFFF) counts as two
    * surrogates, where a codepoint-iterating engine counts one. The
    * operator therefore assumes BMP text (the fixtures are ASCII); for
    * byte-exact histograms on arbitrary input, histogram the UTF-8 BYTES
    * instead (encode + the Multimodal.extractFeatures approach), which
    * every engine agrees on.
    */
  def charClassHistogram(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // the length guard drops any zero-width artifacts of regex-splitting
    // on the empty pattern, which differ between engines
    val buckets = (0 until 8).map(b =>
      size(filter(split(col(textCol), ""),
        c => length(c) === 1 && ascii(c) % 8 === b)).as(s"b$b"))
    docs.select(col(idCol).as("doc_id") +: buckets: _*)
  }

  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.filter(length(col(textCol)) > 0)
      .select(col(idCol).as("doc_id"),
        graft.functions.RollingHash.rollingHash(col(textCol)).as("fingerprint"))

  /** One-pass approximate corpus profile — the sizing numbers every
    * 100 TB curation run needs BEFORE committing to exact work:
    * document count, total tokens, HyperLogLog++ distinct-token estimate
    * (`rsd` relative error; mergeable sketch, no token-level shuffle) and
    * approximate per-document token-count quantiles (p50/p95/p99 via
    * percentile_approx). The exact versions (COUNT(DISTINCT token),
    * exact percentiles) shuffle the full token relation — ~10^12 rows at
    * corpus scale — to compute numbers whose last digits nobody needs;
    * the sketches are single-pass, partial-aggregated map-side, and the
    * error is bounded and configured. Output: one row
    * (n_docs, total_tokens, approx_distinct_tokens, p50_tokens,
    * p95_tokens, p99_tokens).
    */
  /** Gopher-style rule-based document filter (Rae et al. 2021, MassiveText
    * appendix A): the classic pre-quality-model gate every pretraining
    * pipeline runs first. Per document it computes the published metrics —
    * word count, mean word length, symbol-to-word ratio (# and ellipsis),
    * fraction of words containing an alphabetic character, distinct
    * stop-word hits — and the per-rule verdicts plus the conjunction
    * `keep`. Thresholds and the stop list are parameters (the published
    * values are the defaults) because real pipelines retune them per
    * corpus.
    *
    * Scale shape: every metric is a per-row array/string expression —
    * narrow, codegen'd, zero shuffle — so the filter runs at scan
    * bandwidth on any corpus size; it is exactly the kind of operator
    * that must NOT cost a pass of its own at 100 TB (fuse it into the
    * ingest projection).
    * Output: (doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac,
    * stop_hits, keep) with ratios rounded to 4 for cross-engine parity.
    */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minAlphaFrac: Double = 0.8,
      minStopHits: Int = 2,
      stopWords: Seq[String] = Seq("the", "be", "to", "of", "and", "that",
        "have", "with")): DataFrame = {
    val txt = col(textCol)
    val words = expr(s"filter(split($textCol, ' '), w -> w != '')")
    val nWords = size(words)
    // sum of word lengths without materializing a lengths array: total
    // chars minus the spaces (empty split artifacts contribute 0 anyway)
    val charSum = length(regexp_replace(txt, " ", ""))
    val meanLen = charSum.cast("double") / nWords
    // '#' occurrences + '...' occurrences, via length deltas (both
    // engines agree on replace semantics; no regex dialect involved)
    val hashes = length(txt) - length(regexp_replace(txt, "#", ""))
    val ellipses = (length(txt) - length(regexp_replace(txt, "\\.\\.\\.", ""))) / 3
    val symbolRatio = (hashes + ellipses).cast("double") / nWords
    val alphaFrac = size(expr(
      s"filter(filter(split($textCol, ' '), w -> w != ''), " +
        "w -> w rlike '[A-Za-z]')")).cast("double") / nWords
    val stopHits = size(array_intersect(words, array(stopWords.map(lit): _*)))
    val keep = nWords.between(minWords, maxWords) &&
      meanLen.between(minMeanLen, maxMeanLen) &&
      symbolRatio <= maxSymbolRatio && alphaFrac >= minAlphaFrac &&
      stopHits >= minStopHits
    docs.select(col(idCol).as("doc_id"), nWords.cast("long").as("n_words"),
      round(meanLen, 4).as("mean_word_len"),
      round(symbolRatio, 4).as("symbol_ratio"),
      round(alphaFrac, 4).as("alpha_frac"),
      stopHits.cast("long").as("stop_hits"), keep.as("keep"))
  }

  /** Per-GROUP percentile-band filter — [[scoreBandFilter]] with the
    * bounds computed within each group (per language, per source domain):
    * the production form of quality trimming, because score distributions
    * differ wildly across languages and one global band over-trims the
    * tails of every minority group. One grouped aggregation computes all
    * bands (exact interpolated percentile, or the mergeable
    * approx_percentile sketch at 100 TB), the group→band relation is
    * group-cardinality-sized and broadcasts; the filter joins on the
    * group key as a broadcast hash join — the corpus never shuffles and
    * there is no per-group window sort anywhere.
    */
  def groupedScoreBandFilter(scored: DataFrame, groupCol: String,
      scoreCol: String, loPct: Double, hiPct: Double,
      approx: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(loPct >= 0 && hiPct <= 1 && loPct <= hiPct,
      s"bad percentile band [$loPct, $hiPct]")
    val pct = if (approx)
      expr(s"approx_percentile($scoreCol, array($loPct, $hiPct), $accuracy)")
    else expr(s"percentile($scoreCol, array($loPct, $hiPct))")
    val bounds = scored.groupBy(col(groupCol)).agg(pct.as("b"))
      .select(col(groupCol), col("b").getItem(0).as("lo"),
        col("b").getItem(1).as("hi"))
    scored.join(broadcast(bounds), groupCol)
      .filter(col(scoreCol).between(col("lo"), col("hi")))
      .drop("lo", "hi")
  }

  def corpusProfile(docs: DataFrame, idCol: String, textCol: String,
      rsd: Double = 0.02): DataFrame = {
    val perDoc = docs.select(col(idCol).as("doc_id"),
      size(split(col(textCol), " ")).as("n_tokens"),
      col(textCol))
    val docStats = perDoc.agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tokens")).as("total_tokens"),
      percentile_approx(col("n_tokens"), lit(0.5), lit(10000)).as("p50_tokens"),
      percentile_approx(col("n_tokens"), lit(0.95), lit(10000)).as("p95_tokens"),
      percentile_approx(col("n_tokens"), lit(0.99), lit(10000)).as("p99_tokens"))
    val distinctTokens = perDoc
      .select(explode(split(col(textCol), " ")).as("token"))
      .agg(approx_count_distinct(col("token"), rsd).as("approx_distinct_tokens"))
    docStats.crossJoin(distinctTokens)
      .select(col("n_docs"), col("total_tokens"),
        col("approx_distinct_tokens"), col("p50_tokens"),
        col("p95_tokens"), col("p99_tokens"))
  }
}
