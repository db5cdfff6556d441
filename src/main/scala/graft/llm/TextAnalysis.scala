package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
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
  def languageId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = split(col(textCol), " ")
    val en = score(w, "en"); val de = score(w, "de")
    val es = score(w, "es"); val fr = score(w, "fr")
    val hasCjk = col(textCol).rlike("[\\u4e00-\\u9fff]")
    docs.select(col(idCol).as("doc_id"),
      when(hasCjk, "zh")
        .when(en >= de && en >= es && en >= fr && en > 0, "en")
        .when(de >= es && de >= fr && de > 0, "de")
        .when(es >= fr && es > 0, "es")
        .when(fr > 0, "fr")
        .otherwise("und").as("pred_lang"))
  }

  /** Heuristic quality features + composite score.
    * Output: (doc_id, n_chars, n_tokens, avg_token_len, space_ratio,
    * quality_score). All ratios rounded for cross-engine comparability.
    */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val txt = col(textCol)
    val nChars = length(txt)
    val nTokens = size(split(txt, " "))
    val nSpaces = nChars - length(regexp_replace(txt, " ", ""))
    val avgTok = (nChars - nSpaces).cast("double") / nTokens
    val spaceRatio = nSpaces.cast("double") / nChars
    // crude quality: enough tokens, sane token length, sane spacing
    val q = least(nTokens.cast("double") / lit(30.0), lit(1.0)) * lit(0.5) +
      when(avgTok.between(3.0, 8.0), 0.3).otherwise(0.0) +
      when(spaceRatio.between(0.1, 0.3), 0.2).otherwise(0.0)
    docs.select(col(idCol).as("doc_id"), nChars.as("n_chars"),
      nTokens.as("n_tokens"), round(avgTok, 4).as("avg_token_len"),
      round(spaceRatio, 4).as("space_ratio"), round(q, 4).as("quality_score"))
  }

  /** Token counts: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs / digit runs / single other chars).
    * Output: (doc_id, ws_tokens, bpe_tokens).
    * regexp_count counts matches without materializing the token array
    * (regexp_extract_all would allocate every token per row only to take
    * its size — pure garbage pressure at corpus scale).
    */
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
