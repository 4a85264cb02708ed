package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, fingerprinting.
  *
  * Everything is built from native `org.apache.spark.sql.functions`
  * (regexp/higher-order array ops) — no UDFs — so the whole pipeline
  * stays inside whole-stage codegen and distributes trivially: each
  * operator is a pure per-row projection (no shuffle at all), which is
  * the ideal shape at 100 TB (map-only over the document scan).
  */
object TextAnalysis {

  /** Lower-cased alnum word array. Shared normalization for all ops —
    * the codegen'd [[graft.functions.AlnumWords]] byte-scan kernel,
    * bit-identical to the declarative
    * `filter(split(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " "), _ =!= "")`
    * (property-spec-pinned incl. multi-byte text) at a fraction of the
    * cost: the regex chain was three full string rewrites per document
    * and measured as THE floor of every corpus pass in the repo. */
  def words(text: Column): Column = graft.functions.TextKernels.alnumWords(text)

  /** The declarative formulation [[words]] replaces — kept as the
    * equivalence spec's reference model (and documentation of the
    * contract the oracles' `list_filter(string_split(regexp_replace(
    * lower(text), …)))` mirrors). */
  private[graft] def wordsRegex(text: Column): Column =
    filter(split(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " "), w => w =!= "")

  /** Word n-gram array from a words array (empty when shorter than n) —
    * the ONE construction `Dedup.shingles` and `repetition` both use;
    * their outputs must tokenize identically for the oracles to hold.
    * As of r14 this is the codegen'd [[graft.functions.NgramsJoin]]
    * one-pass kernel (bit-identical to the declarative
    * `transform(sequence, i => concat_ws(" ", slice(ws, …)))`,
    * property-spec-pinned) — with [[words]]' byte-scan kernel it takes
    * the shared tokenize floor of every shingle/stats corpus pass from
    * 23.5 s to ~2 s per 500k docs.
    *
    * The historical 57× pitfall (an INLINE `words(col)` re-ran the
    * regex once per gram inside the transform lambda) no longer bites
    * — both sides are single per-row expressions now — but staging
    * `__ws` first remains the house idiom. */
  def ngrams(ws: Column, n: Int): Column =
    graft.functions.TextKernels.ngramsJoin(ws, n)

  /** The declarative formulation [[ngrams]] replaces — the equivalence
    * spec's reference model. */
  private[graft] def ngramsDecl(ws: Column, n: Int): Column =
    when(size(ws) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", slice(ws, i + lit(1), lit(n)))))

  // --- language ID -------------------------------------------------------

  /** Tiny per-language stopword profiles (n-gram-heuristic language ID:
    * score = stopword hits). Real deployments plug bigger profiles in —
    * the operator shape (map-only scoring + argmax) is what matters. */
  val profiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "un", "en"),
    "fr" -> Seq("le", "la", "de", "et", "un", "dans", "est"),
    "zh" -> Seq("de", "le", "shi", "bu", "wo", "you", "zai")
  )

  private def hits(ws: Column, stop: Seq[String]): Column =
    size(filter(ws, w => w.isInCollection(stop)))

  /** One row per doc: predicted language + per-language scores.
    * Tie-break: first language in alphabetical order wins (the CASE
    * chain below — mirrored verbatim in the SQL oracle). */
  def langId(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val withScores = profiles.foldLeft(docs.withColumn("__ws", words(col(textCol)))) {
      case (df, (lang, stop)) => df.withColumn(s"score_$lang", hits(col("__ws"), stop))
    }
    val Seq(de, en, es, fr, zh) = profiles.map { case (l, _) => col(s"score_$l") }
    val pred = when(de >= en && de >= es && de >= fr && de >= zh, "de")
      .when(en >= es && en >= fr && en >= zh, "en")
      .when(es >= fr && es >= zh, "es")
      .when(fr >= zh, "fr")
      .otherwise("zh")
    withScores.select(
      col(idCol) +: pred.as("pred_lang") +: profiles.map { case (l, _) => col(s"score_$l") }: _*)
  }

  // --- quality scoring ---------------------------------------------------

  /** Doc quality score from length/punctuation/stopword statistics.
    *
    * All ratios are FIXED-POINT: floor((a·scale) div b) / scale. Integer
    * floor division is bit-identical on every engine, whereas round() of
    * a float division diverges across engines exactly at half-boundary
    * rationals (e.g. 189/40 = 4.725) — found by the DuckDB oracle. */
  private def withQualityStats(docs: DataFrame, textCol: String): DataFrame = {
    val en = profiles.toMap.apply("en")
    docs
      .withColumn("__ws", words(col(textCol)))
      .withColumn("n_chars_c", length(col(textCol)).cast("long"))
      .withColumn("n_words", size(col("__ws")).cast("long"))
      .withColumn("n_punct", regexp_count(col(textCol), lit("[^A-Za-z0-9\\s]")).cast("long"))
      .withColumn("n_stop", hits(col("__ws"), en).cast("long"))
      .withColumn("word_chars", aggregate(col("__ws"), lit(0L), (a, w) => a + length(w)))
  }

  /** The quality score's integer fixed-point core (×10⁴) — the exact
    * formula `qualityScore` divides down for display. Exposed because
    * downstream exact operators (`topQualityFraction`) aggregate on the
    * BOUNDED INTEGER domain; re-deriving it from the displayed double
    * would re-introduce float rounding at the last ulp. */
  val qualityIntExpr: String =
    "(least(n_words, 100) * 50 + (n_stop * 3000 div greatest(n_words, 1))" +
      " + 2000 - (n_punct * 2000 div greatest(n_chars_c, 1)))"

  /** Guard for operators that APPEND fixed-name output columns to the
    * caller's frame (the same care the `__`-prefixed temporaries get):
    * an input already carrying one of the emitted names would produce
    * ambiguous/silently-overwritten columns — collide loudly instead. */
  private def requireFresh(df: DataFrame, names: String*): Unit = {
    val clash = names.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input already carries output column(s) ${clash.mkString(", ")} — rename before calling")
  }

  /** The input's columns plus `iq`, the integer quality ×10⁴ — keeps
    * group columns in place so gates compose without a re-join. */
  def qualityInt(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    requireFresh(docs, "iq")
    withQualityStats(docs, textCol)
      .withColumn("iq", expr(qualityIntExpr).cast("long"))
      .select(docs.columns.map(col) :+ col("iq"): _*)
  }

  def qualityScore(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    withQualityStats(docs, textCol)
      .withColumn("avg_word_len", expr("(word_chars * 100 div greatest(n_words, 1)) / 100.0D"))
      .withColumn("punct_ratio", expr("(n_punct * 10000 div greatest(n_chars_c, 1)) / 10000.0D"))
      .withColumn("stop_ratio", expr("(n_stop * 10000 div greatest(n_words, 1)) / 10000.0D"))
      .withColumn("quality", expr(s"$qualityIntExpr / 10000.0D"))
      .select(col(idCol), col("n_chars_c"), col("n_words"), col("avg_word_len"),
        col("punct_ratio"), col("stop_ratio"), col("quality"))

  // --- token counting ----------------------------------------------------

  /** Whitespace token count as a composable column — exposed so
    * operators that need tokens NEXT TO other doc columns (packing,
    * capping) stay one map-only projection instead of self-joining
    * the counts table back onto the corpus. */
  def wsTokens(text: Column): Column =
    size(graft.functions.TextKernels.wsWords(text)).cast("long")

  /** Whitespace-split word array KEEPING punctuation and case — the
    * byte-level tokenizer's pre-split (`words` lowercases to [a-z0-9]
    * and belongs to the 36-symbol contract). Mirrors the oracle's
    * `regexp_extract_all(text, '\S+')` exactly. */
  def wsWords(text: Column): Column = graft.functions.TextKernels.wsWords(text)

  /** The regex formulation [[wsWords]] replaces — the equivalence
    * spec's reference model (and the contract the oracles'
    * `regexp_extract_all(text, '\S+')` mirrors). */
  private[graft] def wsWordsRegex(text: Column): Column =
    regexp_extract_all(text, lit("\\S+"), lit(0))

  /** Whitespace tokens + a BPE-ish regex token count (letters runs /
    * single digits / punctuation marks — the GPT-2 pre-tokenizer shape). */
  def tokenCounts(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(
      col(idCol),
      length(col(textCol)).cast("long").as("n_chars_c"),
      wsTokens(col(textCol)).as("ws_tokens"),
      size(regexp_extract_all(lower(col(textCol)), lit("[a-z]+|[0-9]|[^a-z0-9\\s]"), lit(0)))
        .cast("long").as("bpe_tokens"))

  /** Tokenizer COMPRESSION-RATIO signal — bytes per BPE token in ×10⁴
    * fixed point, the cheap junk detector corpus-quality suites run
    * next to the heuristic gates (public practice: character/byte-per-
    * token statistics flag non-language content — symbol soup, OCR
    * noise, and base64-ish blobs compress BADLY under a corpus-fitted
    * vocabulary, every byte costing a token, while natural text sits
    * in a narrow band; tokenizer-fertility analysis is standard in
    * multilingual corpus work, and Gopher's rules track the adjacent
    * mean-word-length statistic). Byte-level contract: words are
    * WHITESPACE-split ([[wsWords]] — punctuation stays inside and
    * costs real tokens), `n_bytes` is their UTF-8 byte mass (spaces
    * excluded: the ratio measures tokenized material only), tokens
    * come from the byte-level BPE kernel (`Bpe.bpeCountBytes`), so the
    * signal is exactly "how many bytes does one vocabulary token
    * carry". Integer arithmetic end-to-end: bpt_x4 = bytes·10⁴ div
    * tokens (zero-token docs → 0 and flag, there is nothing to
    * train on); `flagged` = 1 outside [lo, hi]. One codegen'd map-only
    * projection over the scan — the kernel is the only non-trivial
    * column; no shuffle at any corpus size. */
  def compressionRatio(docs: DataFrame, textCol: String, idCol: String,
                       merges: Seq[(String, String)],
                       lo: Long = 15500L, hi: Long = 90000L): DataFrame = {
    requireFresh(docs, "n_bytes", "bpe_tokens", "bpt_x4", "flagged")
    val ws = wsWords(col(textCol))
    docs
      .select(col(idCol),
        coalesce(aggregate(ws, lit(0L), (a, w) => a + octet_length(w).cast("long")), lit(0L))
          .as("n_bytes"),
        graft.text.Bpe.bpeCountBytes(ws, merges).cast("long").as("bpe_tokens"))
      .withColumn("bpt_x4",
        when(col("bpe_tokens") === 0L, lit(0L))
          .otherwise(expr("n_bytes * 10000 div bpe_tokens")))
      .withColumn("flagged",
        when(col("bpt_x4") < lo || col("bpt_x4") > hi, lit(1)).otherwise(lit(0)))
  }

  /** Deterministic KMV DISTINCT-COUNT sketch over per-group n-grams —
    * bounded-memory cardinality estimation for corpus statistics
    * (vocabulary / n-gram diversity per slice, the numbers tokenizer
    * and mixture decisions read at 100 TB where an exact distinct is a
    * full vocabulary shuffle). KMV = the k-minimum-values estimator
    * (Bar-Yossef et al. 2002, public): keep the k smallest hash values
    * of the element set; estimate = (k−1)·M div h_k with M = 2³².
    * Unlike HLL — whose register layouts and roundings differ across
    * engines — KMV over the SHARED md5 hash is ENGINE-EXACT: both
    * engines pick the identical k smallest values, so the estimate is
    * bit-identical and fully oracle-checkable (the estimator's
    * *accuracy* is then visible in the output next to the exact
    * count, which the query also emits — at deployment only the
    * sketch side runs).
    *
    * Estimated quantity: distinct 32-bit n-gram HASHES (hash
    * collisions conflate n-grams on both engines identically; at
    * vocab ≪ 2³² the difference is negligible and the sketch
    * contract is over the hash space anyway). Groups with fewer than
    * k values saturate: the sketch IS the exact set, est = count.
    *
    * Shape: the SKETCH leg is [[ngramKmvSketch]] — tokenize map-side
    * into the bounded [[graft.functions.KmvMinima]] aggregate, ONE
    * exchange carrying ≤ tasks·k serialized longs per group, NO
    * distinct and no vocabulary-sized shuffle anywhere (the deployment
    * path, and the kernel this query puts under the oracle). The EXACT
    * count is the verification column: it pays the vocabulary-sized
    * distinct the sketch exists to avoid, and exists so the
    * estimator's accuracy is visible in the output. NULL groups drop
    * (the family convention). */
  def ngramKmv(docs: DataFrame, textCol: String, groupCol: String,
               n: Int = 3, k: Int = 256): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val exact = ngramHashes(docs, textCol, groupCol, n).distinct()
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n_distinct"))
    // both legs tokenize; sharing one pinned tokenize would force the
    // sketch leg through the exact leg's vocabulary-sized artifact —
    // exactly the coupling the sketch path must not have
    val sketch = ngramKmvSketch(docs, textCol, groupCol, n, k)
    exact.join(sketch, Seq(groupCol))
      .select(col(groupCol), col("n_distinct"), kmvEstimate("minima", k).as("kmv_est"))
  }

  /** The (group, 32-bit md5 hash) n-gram stream both KMV legs consume —
    * map-only: whitespace-staged tokenize (the ngrams pitfall), explode,
    * hash. The hash is the codegen'd [[graft.functions.Md5Head32]]
    * kernel — bit-identical to `conv(substring(md5(t), 1, 8), 16, 10)`
    * (the oracle's formulation) without rendering and re-parsing 32 hex
    * chars per gram INSTANCE; this expression runs corpus×grams times,
    * the hottest loop in the stats family. */
  private def ngramHashes(docs: DataFrame, textCol: String, groupCol: String,
                          n: Int): DataFrame =
    docs.filter(col(groupCol).isNotNull)
      .withColumn("__ws", words(col(textCol))) // staged: see the ngrams pitfall
      .select(col(groupCol), explode(ngrams(col("__ws"), n)).as("__t"))
      .select(col(groupCol),
        graft.functions.VectorFunctions.md5Head32(col("__t")).as("__h"))

  /** DEPLOYMENT path of the KMV sketch: per-group ascending array of
    * the k smallest distinct n-gram hashes, computed by the bounded
    * [[graft.functions.KmvMinima]] imperative aggregate — each task
    * folds its slice into a ≤ k-long state map-side (partial
    * ObjectHashAggregate), and the ONLY exchange in the plan carries
    * those serialized states: ≤ tasks·k longs per group, flat in the
    * vocabulary AND the corpus. No distinct, no window, no
    * vocabulary-sized shuffle — the shape that stays cheap at 100 TB
    * (plan-pinned by spec). The minima are identical to the
    * distinct-then-rank formulation by construction, so everything
    * downstream (estimate, oracle, standing-state merge) is unchanged.
    * Output: (group, minima array<long>) — the mergeable sketch state
    * a standing corpus-stats table stores per group. */
  def ngramKmvSketch(docs: DataFrame, textCol: String, groupCol: String,
                     n: Int = 3, k: Int = 256): DataFrame =
    ngramHashes(docs, textCol, groupCol, n)
      .groupBy(col(groupCol))
      .agg(graft.functions.KmvMinima.kmvMinima(col("__h"), k).as("minima"))

  /** KMV estimate from a minima array column (ascending, ≤ k entries):
    * saturated sketches (fewer than k minima — the sketch IS the
    * exact distinct set) read out their size; full sketches apply the
    * (k−1)·2³² div h_k estimator. INTEGER `div` (the Column `/` is
    * double division, whose 1-ulp truncation drift an exact oracle
    * cannot tolerate), so the estimate is engine-exact. Name-based:
    * the arithmetic rides `expr`. */
  def kmvEstimate(minimaCol: String, k: Int): Column =
    when(size(col(minimaCol)) < k, size(col(minimaCol)).cast("long"))
      .otherwise(expr(
        s"(${(k - 1).toLong} * 4294967296 div greatest(element_at($minimaCol, $k), 1))"))
      .cast("long")

  /** Corpus-level TOKEN-FREQUENCY health statistics per slice — the
    * distribution diagnostics corpus and tokenizer work reads before
    * committing a mixture (public practice: type-token ratio and
    * hapax share are standard corpus-linguistics health measures —
    * a bot-generated slice shows a collapsed type-token ratio, OCR
    * noise shows a bloated hapax tail — and head-mass concentration
    * is the corpus-level twin of x5's per-doc top-bigram share).
    * Per non-NULL group: total token instances, distinct types, hapax
    * count (types seen exactly once), the mass of the `topK` most
    * frequent types, and the fixed-point ×10⁴ ratios (type-token,
    * hapax-of-types, topK-mass-of-total) — integer div, engine-exact.
    * `topk_mass` is well-defined without a tie-break: it sums the K
    * LARGEST COUNTS as a multiset, so ties at the boundary cannot
    * change the sum.
    *
    * Shape: one map-side-combined (group, token) count — the only
    * corpus-sized pass — then everything is vocabulary-bounded: a
    * per-group aggregate over frequency rows and a two-phase top-K
    * (partition-local rank cuts each task to ≤ K rows per group
    * before the global rank, the ngramKmv discipline — no per-group
    * sort of a web-scale vocabulary on one task). */
  def tokenFrequencyStats(docs: DataFrame, textCol: String, groupCol: String,
                          topK: Int = 10): DataFrame =
    freqStatsTail(docs.filter(col(groupCol).isNotNull)
      .select(col(groupCol), explode(words(col(textCol))).as("__t"))
      .groupBy(col(groupCol), col("__t"))
      .agg(count(lit(1)).cast("long").as("__c")), groupCol, topK)

  /** The distribution-statistics tail shared by [[tokenFrequencyStats]]
    * (one-shot) and `StatsState.tokenStatsReadout` (standing state) —
    * ONE definition so the absorbed-state ≡ one-shot identity can
    * never drift on semantics. Input: a (groupCol, __t, __c) frequency
    * frame; pinned here (vocabulary-sized) because the per-group
    * aggregate and the two-phase top-K cut both consume it. */
  private[graft] def freqStatsTail(freqRaw: DataFrame, groupCol: String,
                                   topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val freq = graft.core.Checkpoints.truncate(freqRaw)
    val agg = freq.groupBy(col(groupCol)).agg(
      sum(col("__c")).cast("long").as("total_tokens"),
      count(lit(1)).cast("long").as("n_types"),
      sum(when(col("__c") === 1L, 1L).otherwise(0L)).cast("long").as("n_hapax"))
    val wLoc = Window.partitionBy(col(groupCol), col("__pid")).orderBy(col("__c").desc)
    val cut = freq.withColumn("__pid", spark_partition_id())
      .withColumn("__rl", row_number().over(wLoc)).filter(col("__rl") <= topK)
    val wG = Window.partitionBy(col(groupCol)).orderBy(col("__c").desc)
    val top = cut.withColumn("__rg", row_number().over(wG))
      .filter(col("__rg") <= topK)
      .groupBy(col(groupCol)).agg(sum(col("__c")).cast("long").as("topk_mass"))
    agg.join(top, Seq(groupCol), "left")
      .withColumn("topk_mass", coalesce(col("topk_mass"), lit(0L)))
      .withColumn("ttr_x4", expr("n_types * 10000 div greatest(total_tokens, 1)"))
      .withColumn("hapax_x4", expr("n_hapax * 10000 div greatest(n_types, 1)"))
      .withColumn("topk_share_x4", expr("topk_mass * 10000 div greatest(total_tokens, 1)"))
  }

  // --- repetition (Gopher/C4-style quality rules) ------------------------

  /** Within-document repetition statistics — the classic
    * training-corpus repetition filters: fraction of duplicated
    * word-3-grams and the share of the single most frequent bigram.
    * The 3-gram part is fully map-only (per-row array ops behind a
    * generator barrier); the bigram mode needs one hash-agg shuffle
    * keyed by (doc, bigram). Ratios are fixed-point (oracle-exact). */
  def repetition(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    def grams(n: Int) = ngrams(col("__ws"), n)
    val base = docs.select(col(idCol).as("id"),
      explode(array(words(col(textCol)))).as("__ws"))
    val tri = base.select(col("id"),
      size(grams(3)).cast("long").as("n_3grams"),
      size(array_distinct(grams(3))).cast("long").as("n_distinct_3grams"))
      .withColumn("dup3_frac",
        expr("((n_3grams - n_distinct_3grams) * 10000 div greatest(n_3grams, 1)) / 10000.0D"))
    val bi = base.select(col("id"), explode(grams(2)).as("g"))
      .groupBy("id", "g").agg(count(lit(1)).as("cnt"))
      .groupBy("id").agg(max("cnt").as("top_cnt"), sum("cnt").as("n_2grams"))
      .withColumn("top_bigram_share",
        expr("(top_cnt * 10000 div greatest(n_2grams, 1)) / 10000.0D"))
    tri.join(bi, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_3grams"), col("n_distinct_3grams"),
        col("dup3_frac"), coalesce(col("top_bigram_share"), lit(0.0)).as("top_bigram_share"))
  }

  // --- keyword extraction ------------------------------------------------

  /** Top-k characteristic terms per document, TF-IDF-shaped but with an
    * INTEGER idf weight (`N div df`) so the scores are engine-exact
    * (log-based idf differs in the last ulp across math libraries,
    * which an exact oracle cannot tolerate). Shapes: one (doc, word)
    * count aggregate, one small doc-frequency aggregate joined back
    * (broadcast — it is vocabulary-sized), one two-level top-k. */
  def keywords(docs: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // corpus size folded INTO the plan (1-row broadcast joined onto the
    // vocabulary-sized df table) — no driver-side count(), so the
    // operator stays a lazily-composable single DAG
    val n = docs.agg(count(lit(1)).cast("long").as("__n"))
    val wc = docs
      .select(col(idCol).as("id"), explode(words(col(textCol))).as("w"))
      .groupBy("id", "w").agg(count(lit(1)).as("tf"))
    val df_ = wc.groupBy("w").agg(count(lit(1)).as("df")).join(broadcast(n))
    val scored = wc.join(broadcast(df_), "w")
      .withColumn("score", col("tf") * expr("__n div df"))
    val win = Window.partitionBy("id").orderBy(col("score").desc, col("w"))
    scored.withColumn("rnk", row_number().over(win))
      .filter(col("rnk") <= k)
      .select(col("id").as(idCol), col("w").as("term"), col("tf"), col("df"), col("score"), col("rnk"))
  }

  // --- fingerprinting ----------------------------------------------------

  /** Content fingerprints: md5 (exact-dup key) + a 64-bit-safe polynomial
    * rolling hash (base 31 mod 1e9+7 — stays in int64 on every engine),
    * computed by graft's codegen'd PolyHash kernel (tight byte loop, no
    * per-character allocation). */
  def fingerprints(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(
      col(idCol),
      md5(col(textCol)).as("content_md5"),
      graft.functions.PolyHash.polyHash(col(textCol)).as("rolling_hash"))

  // --- PII scrubbing -----------------------------------------------------

  /** PII patterns shared verbatim by the Spark path and the DuckDB
    * oracle: RE2-compatible (no backrefs/lookaround), so Java regex and
    * DuckDB find identical matches. Scrub order is fixed (email → IP →
    * phone) — emails are scrubbed first so their digit runs can't be
    * re-matched by the narrower numeric patterns. `\b` is ASCII-safe
    * here (all pattern edges are ASCII alnum); on non-ASCII corpora
    * Java's Unicode-aware boundary could diverge from RE2's ASCII one,
    * so cross-engine checking there should replace `\b` with explicit
    * character classes. */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** Redact emails/IPv4s/phone numbers from a text column — the
    * pre-training privacy pass. Pure per-row projection (three codegen
    * regexp_replace chained + three regexp_count), zero shuffle: the
    * 100 TB shape is one map-only pass over the corpus scan. Output:
    * match counts per category + md5 of the scrubbed text (callers
    * wanting the text itself use `piiScrubText`). */
  def piiScrub(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(
      col(idCol),
      regexp_count(col(textCol), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(col(textCol), lit(IpRe)).cast("long").as("n_ips"),
      regexp_count(col(textCol), lit(PhoneRe)).cast("long").as("n_phones"),
      md5(piiScrubText(col(textCol))).as("scrubbed_md5"))

  /** The scrubbed text column itself (for pipelines that re-emit docs). */
  def piiScrubText(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(EmailRe), lit("<EMAIL>")),
        lit(IpRe), lit("<IP>")),
      lit(PhoneRe), lit("<PHONE>"))

  // --- weighted corpus sampling ------------------------------------------

  /** `rate` as an exact integer threshold against the 32-bit uniform
    * hash (`u < threshold` ⇔ keep with probability `rate`) — integer
    * compares keep the decision bit-identical across engines and runs. */
  def sampleThreshold(rate: Double): Long = (rate * 4294967296.0d).toLong

  /** Deterministic per-row uniform in [0, 2^32): the first 8 hex digits
    * of `md5(seed ':' id)`. Pure projection — reproducible on any
    * engine, any partitioning, any run. */
  def sampleHash(id: Column, seed: String): Column =
    conv(substring(md5(concat(lit(seed + ":"), id.cast("string"))), 1, 8), 16, 10)
      .cast("long")

  /** Weighted corpus sampling / mixing: keep each row with a per-group
    * probability (`rates`, e.g. per-language quotas — the training-mix
    * knob), decided by the deterministic hash above. Map-only, zero
    * shuffle, no RNG state: the 100 TB shape is a codegen'd filter over
    * the scan, and re-running the pipeline reproduces the exact same
    * corpus (the property seeded `sample()` loses on re-partitioning). */
  def weightedSample(docs: DataFrame, idCol: String, groupCol: String,
                     rates: Map[String, Double], default: Double = 1.0,
                     seed: String = "samp"): DataFrame = {
    val thr = rates.foldLeft(lit(sampleThreshold(default))) { case (acc, (k, r)) =>
      when(col(groupCol) === k, lit(sampleThreshold(r))).otherwise(acc)
    }
    docs.filter(sampleHash(col(idCol), seed) < thr)
  }

  /** Token-BUDGET mixing — the mixture step that weighs corpus slices
    * into a training recipe (The Pile / LLaMA-style data mixtures,
    * public): per group (language/source), sample docs so the KEPT
    * token mass lands on the group's budget in expectation. The
    * acceptance threshold is exact integer arithmetic —
    * budget·2³² div group_total — against the deterministic md5
    * uniform, so the same corpus yields the same mixture on any
    * engine, partitioning, or run; a group whose total is already
    * under budget (or has no budget) passes whole. One tiny per-group
    * aggregate + a broadcast join + a codegen'd filter: map-only over
    * the scan at any corpus size. */
  def tokenBudgetSample(docs: DataFrame, idCol: String, groupCol: String,
                        tokenCol: String, budgets: Map[String, Long],
                        seed: String = "mix"): DataFrame = {
    val totals = docs.groupBy(col(groupCol))
      .agg(sum(col(tokenCol)).cast("long").as("__tot"))
    val budget = budgets.foldLeft(lit(null).cast("long")) { case (acc, (k, b)) =>
      when(col(groupCol) === k, lit(b)).otherwise(acc)
    }
    // LEFT join: a NULL group value never equi-matches its own totals
    // row, so inner would silently drop such docs — left leaves __tot
    // null there, and null-group docs can't name a budget either, so
    // they ride the saturate branch and pass whole, consistent with
    // weightedSample's unknown-group default
    docs.join(broadcast(totals), Seq(groupCol), "left")
      .withColumn("__budget", budget)
      // saturate FIRST (no budget, or total already under budget — the
      // zero-total group included): everything keeps, no division runs.
      // The live branch multiplies in DECIMAL(38,0): budget < total can
      // still be billions of tokens, and Long would wrap at 2^31·2^32
      .withColumn("__thr",
        when(col("__budget").isNull || col("__tot") <= col("__budget"), lit(4294967296L))
          .otherwise(expr("CAST(__budget AS DECIMAL(38,0)) * 4294967296 div __tot")))
      .filter(sampleHash(col(idCol), seed) < col("__thr"))
      .drop("__tot", "__budget", "__thr")
  }

  /** Token-budget REPETITION — the up-sampling half of the mixture
    * story (LLaMA-style "epochs per source", public: a high-value
    * slice whose budget EXCEEDS its token mass repeats; `
    * tokenBudgetSample` is the special case budget ≤ total): each doc
    * emits floor(budget/total) full copies plus one md5-decided extra
    * with probability (budget mod total)/total — expected kept tokens
    * = budget exactly, decided per doc by the deterministic uniform
    * (integer/DECIMAL arithmetic end-to-end). Docs in groups with no
    * budget emit once; budget 0 drops the group. Output carries a
    * `copy` index (0-based) so loaders can interleave epochs. Same
    * shape as the sampler: tiny per-group aggregate + broadcast join +
    * codegen'd projection/explode — map-only over the scan. */
  def tokenBudgetRepeat(docs: DataFrame, idCol: String, groupCol: String,
                        tokenCol: String, budgets: Map[String, Long],
                        seed: String = "rep"): DataFrame =
    tokenBudgetRepeatAgainst(docs,
      docs.groupBy(col(groupCol)).agg(sum(col(tokenCol)).cast("long").as("__tot")),
      idCol, groupCol, budgets, seed)

  /** `tokenBudgetRepeat` against EXTERNALLY-MAINTAINED group totals —
    * the incremental-recipe form (p12): a standing refinery accounts
    * budgets over the WHOLE corpus's token mass (standing + batch,
    * superseded ids subtracted), not just the batch in hand, so the
    * batch's copies come from a `totals` frame the caller maintains.
    * `totals` must carry (`groupCol`, `__tot`) — one row per group,
    * broadcast onto the docs. Same copy semantics as the one-shot
    * (floor(budget/total) full copies + one md5-decided extra; no
    * budget → once; NULL group → once). */
  def tokenBudgetRepeatAgainst(docs: DataFrame, totals: DataFrame, idCol: String,
                               groupCol: String, budgets: Map[String, Long],
                               seed: String = "rep"): DataFrame = {
    val budget = budgets.foldLeft(lit(null).cast("long")) { case (acc, (k, b)) =>
      when(col(groupCol) === k, lit(b)).otherwise(acc)
    }
    // LEFT join for the same NULL-group reason as tokenBudgetSample:
    // a null group has a null budget too, so it emits exactly once
    materializeCopies(
      docs.join(broadcast(totals), Seq(groupCol), "left").withColumn("__budget", budget),
      idCol, seed)
  }

  /** Shared copy-materialization for the budget mixers: expects
    * `__tot` (group token total; null on NULL-group rows) and
    * `__budget` (null = no budget → emit once; 0 with a zero total →
    * drop) columns, emits floor(budget/total) full copies plus one
    * md5-decided extra — expected kept tokens = budget exactly. */
  private def materializeCopies(joined: DataFrame, idCol: String, seed: String): DataFrame = {
    requireFresh(joined, "copy")
    joined
      .withColumn("__n",
        when(col("__budget").isNull, lit(1L))
          // a BUDGETED doc whose group is missing from the totals
          // frame has no denominator — with caller-supplied totals
          // (tokenBudgetRepeatAgainst) that is an accounting-drift
          // bug, and silently emitting zero copies would hide it
          .when(col("__tot").isNull,
            expr("raise_error(concat('budgeted group has no totals row for doc ', " +
              s"CAST($idCol AS STRING), ' — the totals frame must cover every budgeted group'))")
              .cast("long"))
          .when(col("__tot") === 0L, lit(0L))
          .otherwise(expr("__budget div __tot") +
            when(sampleHash(col(idCol), seed) <
              expr("CAST(__budget % __tot AS DECIMAL(38,0)) * 4294967296 div __tot"),
              lit(1L)).otherwise(lit(0L))))
      // sequence(0, -1) would count DOWN — zero copies must be an
      // empty array, not a phantom pair
      .withColumn("copy", explode(
        when(col("__n") === 0L, array().cast("array<bigint>"))
          .otherwise(sequence(lit(0L), col("__n") - 1L))))
      .drop("__tot", "__budget", "__n")
  }

  /** TEMPERATURE mixing — α-weighted multilingual sampling (the
    * mBERT/XLM-R exponentiated-smoothing mix, public: sample group g
    * with probability ∝ n_g^α so low-resource slices are upweighted
    * without letting any one slice dominate), at α = 1/2: group
    * weight = ⌊√tokens⌋, group budget = target·w_g div Σw, then the
    * exact `materializeCopies` machinery emits each doc's copies —
    * high-resource groups thin (budget < total), low-resource groups
    * REPEAT (budget > total), both decided per doc by the
    * deterministic md5 uniform. ⌊√n⌋ is engine-exact: IEEE sqrt is
    * correctly rounded and both engines floor the identical double,
    * so the whole mix hash-matches — the reason α is fixed at 1/2
    * rather than a float exponent (x^0.3 is NOT correctly rounded
    * and diverges across math libraries). NULL-group docs carry no
    * weight and emit exactly once (the family convention). Shapes:
    * one tiny per-group aggregate + a 1-row weight-mass broadcast +
    * a broadcast budget join + codegen'd projection/explode —
    * map-only over the scan at any corpus size. */
  def temperatureMix(docs: DataFrame, idCol: String, groupCol: String,
                     tokenCol: String, targetTokens: Long,
                     seed: String = "temp"): DataFrame = {
    val weighted = docs.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(sum(col(tokenCol)).cast("long").as("__tot"))
      .withColumn("__w", expr("CAST(floor(sqrt(CAST(__tot AS DOUBLE))) AS BIGINT)"))
    val sumW = weighted.agg(sum("__w").cast("long").as("__sumw"))
    // target·w in DECIMAL(38,0): a 100 TB target (10¹⁴ tokens) times a
    // √-weight (10⁷) overflows a long
    val budgets = weighted.crossJoin(broadcast(sumW))
      .withColumn("__budget",
        expr(s"CAST(CAST($targetTokens AS DECIMAL(38,0)) * __w div greatest(__sumw, 1L) AS BIGINT)"))
      .select(col(groupCol), col("__tot"), col("__budget"))
    materializeCopies(
      docs.join(broadcast(budgets), Seq(groupCol), "left"), idCol, seed)
  }

  /** Per-source token CAP — domain capping (Gopher/MassiveText-style,
    * public: bound any one domain's contribution to the corpus): each
    * group keeps docs in the deterministic md5 order until its token
    * budget is hit — a doc survives iff its EXCLUSIVE prefix token-sum
    * under that order is < cap, so kept mass is ≤ cap plus the one
    * straddling doc, and the kept SET is identical on any engine,
    * partitioning, or run. Groups already at-or-under cap (and docs
    * with a NULL group, which can't name a budget — the sibling
    * operators' convention) pass whole through a map-only broadcast
    * filter; ONLY over-cap groups pay the prefix-sum window, one
    * parallel window per group. Skew note for the 100 TB shape: the
    * window's per-group sort is the cost, and it runs over just the
    * offending groups; a deployment capping a mega-source can pre-trim
    * with `weightedSample` at rate ≈ cap/total first (the md5 order
    * makes the two compose deterministically), leaving the window a
    * cap-sized tail. Integer arithmetic end-to-end. */
  def sourceCap(docs: DataFrame, idCol: String, groupCol: String,
                tokenCol: String, cap: Long, seed: String = "cap"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // pinned (localCheckpoint — a bare cache() would stay registered
    // in the session's cache manager forever, the x11 ADVICE finding):
    // both union branches below consume the totals; without the pin
    // each branch would re-run the group aggregate (and its corpus
    // scan); the pin is ≤ one row per group
    val totals = graft.core.Checkpoints.truncate(docs.groupBy(col(groupCol))
      .agg(sum(col(tokenCol)).cast("long").as("__tot")))
    // LEFT join: NULL group rows never equi-match their totals row and
    // ride the pass-whole branch, like tokenBudgetSample
    val joined = docs.join(broadcast(totals), Seq(groupCol), "left")
    val under = joined.filter(col("__tot").isNull || col("__tot") <= cap)
      .drop("__tot")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(sampleHash(col(idCol), seed), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val capped = joined.filter(col("__tot") > cap)
      .withColumn("__pre", sum(col(tokenCol)).over(w) - col(tokenCol))
      .filter(col("__pre") < cap)
      .drop("__tot", "__pre")
    under.unionByName(capped)
  }

  /** Deterministic EPOCH shuffle for training loaders: a reproducible
    * global permutation of the corpus per epoch, materialized as
    * (shard, pos) coordinates. No global sort anywhere — the md5
    * uniform IS the permutation: shard = u·nShards div 2³² (map-only,
    * balanced in expectation), pos = rank of u within the shard (one
    * window per shard, parallel across shards). Changing `epoch`
    * reshuffles everything deterministically; the same (corpus, epoch,
    * nShards) triple yields the identical order on any engine,
    * partitioning, or run — the property seeded `repartition`+`sort`
    * loses on re-planning. Readers stream shard files in pos order and
    * get the epoch's permutation. */
  def epochShuffle(docs: DataFrame, idCol: String, epoch: Int,
                   nShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    requireFresh(docs, "shard", "pos")
    val u = sampleHash(col(idCol), s"epoch$epoch")
    docs
      .withColumn("__u", u)
      .withColumn("shard", expr(s"__u * $nShards div 4294967296").cast("int"))
      .withColumn("pos",
        (row_number().over(Window.partitionBy(col("shard"))
          .orderBy(col("__u"), col(idCol))) - 1).cast("long"))
      .drop("__u")
  }

  /** CURRICULUM-ordered epoch shuffle — [[epochShuffle]] with a
    * coarse difficulty/quality STAGE steering the within-shard order
    * (curriculum learning, Bengio et al. 2009, public; quality-ordered
    * pretraining schedules are its standard data-side application):
    * pos ranks by (stage asc, u, id), so every shard reads stage 0's
    * docs first, shuffled within the stage by the epoch's uniform.
    * Shard assignment is unchanged from [[epochShuffle]] (map-only,
    * balanced), so each stage occupies fractionally ALIGNED pos ranges
    * across shards — a loader interleaving shards at equal pos
    * consumes the stages in order globally, without the global
    * stage-sort this family never runs. The window stays one
    * parallel per-shard rank; same determinism contract as p6 (the
    * (corpus, stage, epoch, nShards) tuple fixes the coordinates on
    * any engine/partitioning/run). NULL stages order LAST (unstaged
    * docs after every named stage, both engines' ASC default). */
  def curriculumShuffle(docs: DataFrame, idCol: String, stageCol: String,
                        epoch: Int, nShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    requireFresh(docs, "shard", "pos")
    val u = sampleHash(col(idCol), s"epoch$epoch")
    docs
      .withColumn("__u", u)
      .withColumn("shard", expr(s"__u * $nShards div 4294967296").cast("int"))
      .withColumn("pos",
        (row_number().over(Window.partitionBy(col("shard"))
          .orderBy(col(stageCol).asc_nulls_last, col("__u"), col(idCol))) - 1).cast("long"))
      .drop("__u")
  }

  /** Exact per-group top-q% gate WITHOUT a per-group global sort — the
    * adaptive quality-threshold step (FineWeb-style per-slice filtering,
    * public: keep each language's best q% by score rather than one
    * global cutoff). Semantically identical to
    * `row_number() OVER (PARTITION BY group ORDER BY score DESC, id)
    * <= ceil(n·q)` — which is the oracle — but computed in the shape
    * that survives 100 TB:
    *
    *  1. histogram: count per (group, score) — scores are FIXED-POINT
    *     integers on a bounded domain, so this aggregate is map-side
    *     combined and its result is tiny regardless of corpus size;
    *  2. per-group threshold from the histogram's cumulative (a window
    *     over histogram rows, not docs): t = the score where the
    *     running count first reaches k = ceil(n·qBp/10⁴), plus how
    *     many ties at t are still needed;
    *  3. docs with score > t pass through a broadcast-joined map-only
    *     filter; ONLY the boundary score's docs (one score value per
    *     group) pay a row_number to break ties by id.
    *
    * The per-group sort a naive window would do over the whole corpus
    * never happens — the heavy path is one map-side-combinable
    * aggregate plus a map-only filter. Ties at the threshold keep the
    * LOWEST ids, matching the oracle's deterministic order.
    *
    * NULL scores cannot rank: they are excluded from the histogram AND
    * from n (so k = ceil(q · non-null count)) and are never emitted —
    * the family's NULL-group convention applied to the score axis.
    * Without the exclusion a null-score histogram row could BE a
    * group's threshold row (null __t → the whole group silently
    * emits nothing) and null rows would inflate k. */
  def topQualityFraction(docs: DataFrame, idCol: String, groupCol: String,
                         scoreCol: String, qBp: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qBp >= 0 && qBp <= 10000, s"qBp is basis points, got $qBp")
    val scored = docs.filter(col(scoreCol).isNotNull)
    val hist = scored.groupBy(col(groupCol), col(scoreCol))
      .agg(count(lit(1)).cast("long").as("__c"))
    val wDesc = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
    // per group: k docs wanted; per score: how many docs sit strictly
    // above it (__above). The threshold row is the one where
    // __above < k <= __above + __c; it needs k - __above of its ties.
    val marked = hist
      .withColumn("__above", sum(col("__c")).over(wDesc) - col("__c"))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .withColumn("__k", expr(s"(__n * $qBp + 9999) div 10000"))
    // pinned (localCheckpoint, the sibling operators' idiom — a bare
    // .cache() would stay registered in the session's cache manager
    // forever): both union branches below consume the thresholds;
    // without the pin each branch re-runs the histogram aggregate and
    // its corpus scan (the sourceCap totals precedent); the pin is
    // one row per group
    // __ties = the threshold row's full tie count — read driver-side
    // (thresholds is pinned, one row per group) to pick the tie-break
    // shape below
    val thresholds = graft.core.Checkpoints.truncate(marked
      .filter(col("__above") < col("__k") && col("__k") <= col("__above") + col("__c"))
      .select(col(groupCol), col(scoreCol).as("__t"),
        (col("__k") - col("__above")).as("__need"), col("__c").as("__ties")))
    // LEFT join (the family's NULL-group convention): a NULL group
    // never equi-matches a thresholds row, gets a NULL __t, and is
    // dropped — q% of nothing nameable is nothing. Groups land one
    // row each in `thresholds`, so the join broadcasts at any scale.
    val joined = scored.join(broadcast(thresholds.drop("__ties")), Seq(groupCol), "left")
    val above = joined.filter(col(scoreCol) > col("__t"))
      .drop("__t", "__need")
    // boundary: only score == t rows pay a tie-break. TWO shapes,
    // picked by the largest group's boundary size (known exactly from
    // the threshold rows — one metadata-sized read of the pinned
    // frame, no extra corpus pass):
    //  - small boundaries (the overwhelmingly common case): one plain
    //    per-group row_number window over the boundary rows — tiny,
    //    and it skips the two extra pins the sliced path needs;
    //  - a DEGENERATE boundary (a single score value dominating a
    //    group — a bot-generated slice scoring identically — where
    //    the boundary IS the group): a distributed RANGE-rank, so no
    //    partition ever sorts more than its slice. Shape: range-
    //    repartition boundary rows by (group, id) so each task holds
    //    a contiguous bounded id-slice (pinned — both consumers below
    //    must see the same partition ids); per-(slice, group) counts
    //    (a tiny aggregate, one row per task×group) turned into
    //    prefix offsets and broadcast back; local ranks within each
    //    slice plus the offset give the exact per-group global
    //    id-rank. Results identical (oracle-pinned on both paths).
    val maxTies = thresholds.agg(max("__ties")).collect()(0) match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val boundary = if (maxTies < BoundarySliceCutoff) {
      val wTie = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      joined.filter(col(scoreCol) === col("__t"))
        .withColumn("__rn", row_number().over(wTie))
        .filter(col("__rn") <= col("__need"))
        .drop("__t", "__need", "__rn")
    } else {
      slicedGroupRank(joined.filter(col(scoreCol) === col("__t")), groupCol, Seq(idCol))
        .filter(col("__rn") <= col("__need"))
        .drop("__t", "__need", "__rn")
    }
    above.unionByName(boundary)
  }

  /** Distributed per-group rank through BOUNDED slices — the degenerate
    * boundary's tie-break shape, shared by [[topQualityFraction]] and
    * [[holdoutSplit]]: range-repartition the rows by (group, orderCols)
    * so each task holds a contiguous bounded slice (pinned — both
    * consumers below must see the same partition ids); per-(slice,
    * group) counts (a tiny aggregate, one row per task×group) turned
    * into prefix offsets and broadcast back; local ranks within each
    * slice plus the offset give the exact per-group global rank. No
    * partition ever sorts more than its slice. Returns the rows plus
    * `__rn` (1-based rank within group by `orderCols`). */
  private def slicedGroupRank(rows: DataFrame, groupCol: String,
                              orderCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val oc = orderCols.map(col)
    val sliced = graft.core.Checkpoints.truncate(
      rows.repartitionByRange((col(groupCol) +: oc): _*))
      .withColumn("__pid", spark_partition_id())
    val wOff = Window.partitionBy(col(groupCol)).orderBy(col("__pid"))
    val offsets = sliced.groupBy(col("__pid"), col(groupCol))
      .agg(count(lit(1)).as("__pc"))
      .withColumn("__off", sum(col("__pc")).over(wOff) - col("__pc"))
      .select(col("__pid"), col(groupCol), col("__off"))
    val wLocal = Window.partitionBy(col("__pid"), col(groupCol)).orderBy(oc: _*)
    sliced.join(broadcast(offsets), Seq("__pid", groupCol))
      .withColumn("__rn", row_number().over(wLocal) + col("__off"))
      .drop("__pid", "__off")
  }

  /** EXACT per-group quantile read-outs over a BOUNDED fixed-point
    * score domain — the p50/p90/p99-per-slice table a data team reads
    * before choosing x11's q (public practice: per-language quality
    * percentile dashboards precede threshold decisions). Each quantile
    * is the rank-based order statistic — the value at rank
    * ceil(qBp·n/10⁴) in score-ascending order, the discrete inverse
    * CDF — which, unlike a float t-digest or interpolated percentile,
    * is ENGINE-EXACT: the oracle recomputes it as a row_number window
    * and must match bit-for-bit.
    *
    * Shape (the x11 histogram discipline): ONE map-side-combined count
    * per (group, score) — scores are fixed-point integers on a bounded
    * domain (iq ∈ [0, 10⁴]), so the histogram is tiny at any corpus
    * size — then a cumulative window and the quantile aggregate run
    * over HISTOGRAM rows only. No per-group sort of the corpus exists
    * in the plan. The value at rank r equals min{v : #(score ≤ v) ≥ r}
    * independent of tie order, so ties cannot diverge the engines.
    * NULL scores cannot rank and NULL groups drop (the x11/family
    * conventions); one output row per group, one column per requested
    * (name, qBp). */
  def groupQuantiles(scored: DataFrame, groupCol: String, scoreCol: String,
                     quantiles: Seq[(String, Int)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(quantiles.nonEmpty, "need at least one quantile")
    require(quantiles.forall { case (_, q) => q >= 1 && q <= 10000 },
      s"quantiles are basis points in [1, 10000], got $quantiles")
    val hist = scored.filter(col(groupCol).isNotNull && col(scoreCol).isNotNull)
      .groupBy(col(groupCol), col(scoreCol).as("__v"))
      .agg(count(lit(1)).cast("long").as("__c"))
    val wAsc = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
    val cdf = hist
      .withColumn("__cum", sum(col("__c")).over(wAsc))
      .withColumn("__n", sum(col("__c")).over(wAll))
    val aggs = quantiles.map { case (name, q) =>
      min(when(col("__cum") >= expr(s"(__n * $q + 9999) div 10000"), col("__v"))).as(name)
    }
    cdf.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Deterministic EXACT-COUNT train/holdout split — the eval-set cut
    * every training pipeline makes before any mixing or dedup decision
    * (public practice: held-out validation slices are drawn per
    * language/source so low-resource groups stay represented, and the
    * split must be reproducible run-over-run and stable under
    * re-sharding). Per non-NULL group, EXACTLY k = ceil(n·holdBp/10⁴)
    * docs land in the holdout — not a binomial threshold sample
    * ([[weightedSample]]'s count drifts ±√n): the holdout is the k
    * docs with the smallest (u, id) in the group, u = the
    * deterministic md5 uniform ([[sampleHash]]).
    *
    * The per-group sort a naive `row_number() OVER (ORDER BY u)` pays
    * — the whole corpus through group-sized sort partitions — never
    * happens. The x11 histogram discipline applies, but NOT x11's
    * per-value histogram: u is unique per doc, so counting per value
    * would be corpus-sized. The uniform's own distribution is the
    * lever instead:
    *
    *  1. coarse histogram over the uniform's top `bucketBits` bits —
    *     count per (group, bucket), map-side combined, ≤ groups·2^bits
    *     rows regardless of corpus size;
    *  2. per-group threshold BUCKET from the histogram cumulative (a
    *     window over histogram rows, not docs): the bucket where the
    *     running count first reaches k, plus how many of its docs are
    *     still needed;
    *  3. docs below/above the threshold bucket split map-side behind a
    *     broadcast join; ONLY the threshold bucket's docs — expected
    *     n/2^bits per group, u is uniform by construction — pay an
    *     exact (u, id) rank: a plain per-group window when the
    *     boundary is small, [[slicedGroupRank]] past `sliceCutoff`.
    *
    * `bucketBits` trades histogram size (groups·2^bits rows) against
    * boundary size (n/2^bits docs): 16 holds boundaries under ~100k to
    * ~10¹⁰ docs per group; raise toward 24 at the extreme tail (the
    * histogram stays tiny) before the sliced rank is ever load-bearing.
    * Ties on u (md5 collisions) break by id, matching the oracle's
    * ORDER BY u, id.
    *
    * NULL-group docs cannot name a quota and go to `train` whole — the
    * family's NULL-group convention applied conservatively: never let
    * unattributed rows leak into an eval set. Output = `docs` plus a
    * `split` column ('holdout' | 'train'); the two parts partition the
    * corpus by construction.
    *
    * ONE-SHOT BY DESIGN (the p16 rationale): k = ceil(n·f) is a dense
    * function of the whole snapshot — a doc's side can legitimately
    * change when n grows — so the exact-count split is recomputed per
    * corpus snapshot, not maintained incrementally. A pipeline that
    * needs new docs to receive a STABLE side on arrival uses the
    * stateless threshold decision ([[weightedSample]]'s u < f·2³²,
    * per-doc, count binomial) or `Dedup.leakProofSplit`. */
  def holdoutSplit(docs: DataFrame, idCol: String, groupCol: String,
                   holdBp: Int, seed: String = "split", bucketBits: Int = 16,
                   sliceCutoff: Long = BoundarySliceCutoff): DataFrame = {
    require(holdBp >= 0 && holdBp <= 10000, s"holdBp is basis points, got $holdBp")
    splitBySmallestU(docs, idCol, groupCol,
      expr(s"(__n * $holdBp + 9999) div 10000"), seed, bucketBits, sliceCutoff)
  }

  /** EXACT-COUNT per-group sample — "give me exactly N docs per
    * group" (fixed-size eval/calibration draws per language/source;
    * the fixed-COUNT sibling of [[holdoutSplit]]'s fixed-fraction
    * cut, same public practice): keeps, per named group, exactly
    * min(k, n) docs — the k smallest (u, id) under the deterministic
    * md5 uniform; a group whose quota exceeds its size keeps WHOLE
    * (the saturation rule every budget operator here follows).
    * Groups without a quota — NULL included — are dropped: this is a
    * selection, not a partition. Same machinery, same 100 TB shape,
    * and the same one-shot-by-design contract as [[holdoutSplit]]
    * (the selected SET is a function of the snapshot). */
  def sampleExact(docs: DataFrame, idCol: String, groupCol: String,
                  counts: Map[String, Long], seed: String = "exact",
                  bucketBits: Int = 16,
                  sliceCutoff: Long = BoundarySliceCutoff): DataFrame = {
    require(counts.values.forall(_ >= 0), s"counts must be >= 0: $counts")
    val kMap = counts.foldLeft(lit(null).cast("long")) { case (acc, (g, k)) =>
      when(col(groupCol) === g, lit(k)).otherwise(acc)
    }
    // least(quota, n): an over-sized quota saturates to the whole
    // group. The NULL (unnamed-group) case needs an EXPLICIT branch:
    // least() ignores NULLs on both engines (least(NULL, n) = n), so
    // a bare least would hand every unnamed group a full quota
    // instead of dropping it — caught by the oracle on first verify
    splitBySmallestU(docs, idCol, groupCol,
        when(kMap.isNull, lit(null).cast("long"))
          .otherwise(least(kMap, col("__n"))),
        seed, bucketBits, sliceCutoff)
      .filter(col("split") === "holdout").drop("split")
  }

  /** The shared engine of [[holdoutSplit]] and [[sampleExact]]:
    * label each doc 'holdout' (its (u, id) ranks among the group's
    * smallest k) or 'train', where k = `kExpr` evaluated on the
    * histogram frame (columns: groupCol, `__n` = the group's non-NULL
    * doc count). See holdoutSplit's scaladoc for the shape. */
  private def splitBySmallestU(docs: DataFrame, idCol: String, groupCol: String,
                               kExpr: Column, seed: String, bucketBits: Int,
                               sliceCutoff: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bucketBits >= 0 && bucketBits <= 32, s"bucketBits in [0, 32], got $bucketBits")
    requireFresh(docs, "split")
    val withU = docs
      .withColumn("__u", sampleHash(col(idCol), seed))
      .withColumn("__b", shiftright(col("__u"), 32 - bucketBits))
    val hist = withU.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol), col("__b"))
      .agg(count(lit(1)).cast("long").as("__c"))
    val wAsc = Window.partitionBy(col(groupCol)).orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
    val marked = hist
      .withColumn("__below", sum(col("__c")).over(wAsc) - col("__c"))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .withColumn("__k", kExpr)
    // exactly one threshold row per group (k ≥ 1 crosses one bucket's
    // cumulative; k = 0 matches none → everything trains). Pinned: the
    // maxTies read plus both split branches consume it, and the pin is
    // one row per group
    val thresholds = graft.core.Checkpoints.truncate(marked
      .filter(col("__below") < col("__k") && col("__k") <= col("__below") + col("__c"))
      .select(col(groupCol), col("__b").as("__tb"),
        (col("__k") - col("__below")).as("__need"), col("__c").as("__ties")))
    // LEFT join: NULL groups (and every group at k = 0 or k NULL)
    // match no threshold row, get a NULL __tb, and train whole
    val joined = withU.join(broadcast(thresholds.drop("__ties")), Seq(groupCol), "left")
    val decided = joined.filter(col("__tb").isNull || col("__b") =!= col("__tb"))
      .withColumn("split",
        when(col("__tb").isNotNull && col("__b") < col("__tb"), lit("holdout"))
          .otherwise(lit("train")))
      .drop("__u", "__b", "__tb", "__need")
    // boundary-bucket size is known exactly from the pinned threshold
    // rows (one metadata-sized read, the x11 idiom) — it picks the
    // tie-break shape
    val maxTies = thresholds.agg(max("__ties")).collect()(0) match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val bRows = joined.filter(col("__b") === col("__tb"))
    val ranked = if (maxTies < sliceCutoff) {
      val wTie = Window.partitionBy(col(groupCol)).orderBy(col("__u"), col(idCol))
      bRows.withColumn("__rn", row_number().over(wTie))
    } else slicedGroupRank(bRows, groupCol, Seq("__u", idCol))
    val boundary = ranked
      .withColumn("split",
        when(col("__rn") <= col("__need"), lit("holdout")).otherwise(lit("train")))
      .drop("__u", "__b", "__tb", "__need", "__rn")
    decided.unionByName(boundary)
  }

  /** Boundary size above which [[topQualityFraction]]'s tie-break
    * switches from a plain per-group window to the sliced range-rank:
    * below this many tied rows a single task sorts the boundary
    * comfortably; above it (the degenerate single-score-dominates
    * corpus) the sliced shape keeps every sort bounded. */
  val BoundarySliceCutoff = 100000L

  /** Sequence PACKING — the concat-and-chunk step that turns a
    * filtered corpus into fixed-capacity training sequences (the
    * standard pretraining loader shape, public: documents are
    * concatenated in a deterministic order and sliced every `capacity`
    * tokens; a document may straddle a chunk boundary). Packing is
    * per-SHARD: shard = (group, id div shardSize), documents ordered
    * by id within the shard, so every window is bounded by
    * shardSize docs regardless of corpus size — the global prefix-sum
    * a single concat order would need (one task, 100 TB through it)
    * never happens, and shards pack in parallel after one uniform
    * shuffle. The boundary cost is real but amortized: at most one
    * partly-empty final bin per shard.
    *
    * Emits one row per doc with its placement: `shard` (id-range index
    * within the group), `bin_first`/`bin_last` (the chunk ids this
    * doc's tokens land in, within the shard), `offset_in_bin` (token
    * offset of the doc's first token in bin_first). Integer arithmetic
    * end-to-end; zero-token docs sit at their neighbour's boundary
    * (bin_last = bin_first, zero width). */
  def packSequences(docs: DataFrame, idCol: String, groupCol: String,
                    tokenCol: String, capacity: Long, shardSize: Long): DataFrame = {
    require(capacity > 0 && shardSize > 0)
    requireFresh(docs, "shard", "bin_first", "bin_last", "offset_in_bin")
    val sharded = docs.withColumn("shard", expr(s"$idCol div $shardSize").cast("long"))
    packPlacements(sharded, groupCol, tokenCol, capacity, Seq(col(idCol)))
  }

  /** [[packSequences]] in an EXPLICIT order — the composition point
    * with the epoch permutation (p6): instead of hard-ordering by id
    * within id-range shards, the caller supplies the (shard, position)
    * coordinates to pack in — e.g. [[epochShuffle]]'s output — and the
    * concat-and-chunk runs in THAT order, so the packed stream IS the
    * epoch ordering. Same placement contract and the same 100 TB shape
    * (shards pack in parallel after one uniform shuffle; every window
    * is bounded by the shard's membership); `posCol` must rank docs
    * uniquely within its (group, shard) — ties fall back to id order.
    * `shardCol` is surfaced as `shard` in the output placements.
    *
    * Deliberately ONE-SHOT, unlike the id-ordered packer (which has
    * the incremental [[PackIndex]] form): an epoch permutation's
    * ranks are a function of the WHOLE corpus ([[epochShuffle]]'s pos
    * is a dense per-shard rank), so any corpus growth reassigns
    * ranks globally and no placement is stable under deltas — a
    * loader re-derives the epoch stream per epoch from the standing
    * id-ordered state instead (p6 + this, both one-pass). */
  def packSequencesBy(docs: DataFrame, idCol: String, groupCol: String,
                      tokenCol: String, capacity: Long,
                      shardCol: String, posCol: String): DataFrame = {
    require(capacity > 0)
    requireFresh(docs, "bin_first", "bin_last", "offset_in_bin")
    // normalize to a LONG `shard` output column (the packSequences
    // placement contract) whatever the caller's shard column is named
    // or typed — epochShuffle emits an int shard, placements carry long
    val sharded =
      if (shardCol == "shard") docs.withColumn("shard", col("shard").cast("long"))
      else {
        requireFresh(docs, "shard")
        docs.withColumn("shard", col(shardCol).cast("long"))
      }
    packPlacements(sharded, groupCol, tokenCol, capacity,
      Seq(col(posCol), col(idCol)))
  }

  /** Shared placement arithmetic of the two packers: prefix-sum the
    * token counts per (group, shard) in `order`, then integer
    * chunk arithmetic. */
  private def packPlacements(sharded: DataFrame, groupCol: String,
                             tokenCol: String, capacity: Long,
                             order: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol), col("shard"))
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    sharded
      .withColumn("__pre", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("bin_first", expr(s"__pre div $capacity"))
      .withColumn("bin_last",
        when(col(tokenCol) <= 0L, col("bin_first"))
          .otherwise(expr(s"(__pre + $tokenCol - 1) div $capacity")))
      .withColumn("offset_in_bin", expr(s"__pre % $capacity"))
      .drop("__pre")
  }

  /** Loader-facing BIN MANIFEST — `packSequences`'s per-doc placements
    * exploded into per-(shard, bin) doc SEGMENTS, the view a training
    * data loader consumes directly: for every bin, which docs
    * contribute which token ranges at which offsets. One row per
    * (doc, bin) the doc touches — a straddling doc emits a
    * continuation row per spanned bin; a zero-token doc emits one
    * zero-length row (every doc stays visible in the manifest).
    * Columns appended: `shard`, `bin`, `seg_start` (first token of
    * this segment within the DOC), `seg_len`, `bin_offset` (where the
    * segment starts within the BIN). Invariants (spec-pinned): per
    * doc, segments tile [0, tokens) contiguously across consecutive
    * bins; per bin, segments tile from offset 0 and sum to ≤ capacity
    * (= capacity for every non-final bin of a shard). Shape: the p10
    * machinery plus a map-only explode bounded by ⌈tokens/capacity⌉+1
    * rows per doc — the manifest is O(corpus tokens / capacity) rows
    * and packs in parallel exactly like p10. */
  def packedBins(docs: DataFrame, idCol: String, groupCol: String,
                 tokenCol: String, capacity: Long, shardSize: Long): DataFrame = {
    requireFresh(docs, "bin", "seg_start", "seg_len", "bin_offset")
    explodeToSegments(
      packSequences(docs, idCol, groupCol, tokenCol, capacity, shardSize),
      tokenCol, capacity)
  }

  /** [[packedBins]] in an explicit (shard, position) order — the
    * manifest over [[packSequencesBy]] placements, e.g. the epoch
    * permutation's. Same segment invariants. */
  def packedBinsBy(docs: DataFrame, idCol: String, groupCol: String,
                   tokenCol: String, capacity: Long,
                   shardCol: String, posCol: String): DataFrame = {
    requireFresh(docs, "bin", "seg_start", "seg_len", "bin_offset")
    explodeToSegments(
      packSequencesBy(docs, idCol, groupCol, tokenCol, capacity, shardCol, posCol),
      tokenCol, capacity)
  }

  /** Shared segment explode of the manifest builders: each placement
    * row explodes to one row per spanned bin with the (seg_start,
    * seg_len, bin_offset) tiling — map-only, bounded by
    * ⌈tokens/capacity⌉+1 rows per doc. */
  private def explodeToSegments(placed: DataFrame, tokenCol: String,
                                capacity: Long): DataFrame =
    placed
      .withColumn("bin", explode(sequence(col("bin_first"), col("bin_last"))))
      // the doc's exclusive prefix token-sum, recovered from its
      // placement (pre = bin_first·capacity + offset_in_bin) — saves
      // threading __pre through packSequences's public schema
      .withColumn("__pre", col("bin_first") * capacity + col("offset_in_bin"))
      .withColumn("seg_start",
        when(col("bin") === col("bin_first"), lit(0L))
          .otherwise(col("bin") * capacity - col("__pre")))
      .withColumn("seg_len",
        when(col(tokenCol) <= 0L, lit(0L))
          .otherwise(least(col("__pre") + col(tokenCol), (col("bin") + 1) * capacity)
            - greatest(col("__pre"), col("bin") * capacity)))
      .withColumn("bin_offset", greatest(col("__pre") - col("bin") * capacity, lit(0L)))
      .drop("bin_first", "bin_last", "offset_in_bin", "__pre")

  /** The FINAL loader artifact — fixed-capacity training sequences as
    * TOKEN STREAMS: each doc carries its token-id array (`idsCol`,
    * e.g. `Bpe.bpeEncode` output) and the packer's segments explode to
    * one row per token, keyed (group, shard, bin, bin_pos) — exactly
    * the (sequence, position, token) coordinates a trainer reads.
    * Token counts for packing come FROM the arrays (`size(ids)`), so
    * the stream and the placement arithmetic can never disagree.
    * Invariants inherited from [[packedBins]]: within a bin, bin_pos
    * tiles [0, filled) with no gaps; non-final bins of a shard fill to
    * exactly `capacity`. Shape: the p10 machinery plus a map-only
    * slice+explode — output volume is the corpus's token count, the
    * floor for any materialized token stream. */
  def packedTokenStream(docs: DataFrame, idCol: String, groupCol: String,
                        idsCol: String, capacity: Long, shardSize: Long): DataFrame = {
    requireFresh(docs, "bin_pos", "token_id")
    val withN = withArrayLen(docs, idsCol)
    sliceToTokens(
      packedBins(withN, idCol, groupCol, "__n", capacity, shardSize),
      groupCol, idsCol)
  }

  /** [[packedTokenStream]] in an explicit (shard, position) order —
    * with [[epochShuffle]] coordinates this emits the training token
    * stream IN the epoch permutation: same token multiset per (group,
    * shard) cell, epoch-dependent (bin, bin_pos) placement. */
  def packedTokenStreamBy(docs: DataFrame, idCol: String, groupCol: String,
                          idsCol: String, capacity: Long,
                          shardCol: String, posCol: String): DataFrame = {
    requireFresh(docs, "bin_pos", "token_id")
    val withN = withArrayLen(docs, idsCol)
    sliceToTokens(
      packedBinsBy(withN, idCol, groupCol, "__n", capacity, shardCol, posCol),
      groupCol, idsCol)
  }

  /** [[packedTokenStream]] WITH document identity — the loader view
    * block-diagonal attention and loss masking need (public practice:
    * packed pretraining sequences reset attention at document
    * boundaries — e.g. the T5/LLaMA-style packing with cross-document
    * attention masking — so the trainer must know where each doc
    * starts inside every bin): each token row additionally carries
    * its source doc (`doc_id` as emitted by `idCol`) and `doc_start`
    * = 1 on the doc's FIRST token only — a straddling doc's
    * continuation segment is NOT a start (seg_start > 0), so a mask
    * built by cumulative-summing `doc_start` within a bin segments
    * the bin exactly into its documents. Zero-token docs have no
    * tokens and therefore no start row (they are visible in the p13
    * manifest, not in the stream — the stream is the token multiset).
    * Same shape as [[packedTokenStream]]: the p10 machinery + a
    * map-only slice+explode, output volume = corpus token count. */
  def packedMaskStream(docs: DataFrame, idCol: String, groupCol: String,
                       idsCol: String, capacity: Long, shardSize: Long): DataFrame = {
    requireFresh(docs, "bin_pos", "token_id", "doc_start")
    val withN = withArrayLen(docs, idsCol)
    packedBins(withN, idCol, groupCol, "__n", capacity, shardSize)
      .filter(col("seg_len") > 0)
      .select(col(groupCol), col(idCol), col("shard"), col("bin"),
        col("bin_offset"), col("seg_start"),
        posexplode(slice(col(idsCol), (col("seg_start") + 1).cast("int"),
          col("seg_len").cast("int"))).as(Seq("__k", "token_id")))
      .withColumn("bin_pos", col("bin_offset") + col("__k"))
      .withColumn("doc_start",
        when(col("seg_start") === 0L && col("__k") === 0, lit(1)).otherwise(lit(0)))
      .drop("__k", "bin_offset", "seg_start")
  }

  /** NULL id arrays count as zero-width. The guard is an explicit
    * isNull branch, NOT coalesce(size(...)): size(NULL) is NULL under
    * ANSI but -1 under legacy sizeOfNull, and a -1 sails through
    * coalesce and shifts every later placement in the shard —
    * zero-width semantics must hold regardless of session ANSI
    * config. */
  private def withArrayLen(docs: DataFrame, idsCol: String): DataFrame =
    docs.withColumn("__n",
      when(col(idsCol).isNull, lit(0L)).otherwise(size(col(idsCol)).cast("long")))

  /** Shared final explode of the token-stream builders: slice each
    * doc's id array to its segment and emit (bin, bin_pos, token_id)
    * scalar rows — map-only, output volume = corpus token count. */
  private def sliceToTokens(segments: DataFrame, groupCol: String,
                            idsCol: String): DataFrame =
    segments
      .filter(col("seg_len") > 0)
      .select(col(groupCol), col("shard"), col("bin"), col("bin_offset"),
        posexplode(slice(col(idsCol), (col("seg_start") + 1).cast("int"),
          col("seg_len").cast("int"))).as(Seq("__k", "token_id")))
      .withColumn("bin_pos", col("bin_offset") + col("__k"))
      .drop("__k", "bin_offset")

  // --- learned quality filter (x9) ---------------------------------------

  /** Fixed-point scale for learned purities/fractions (integer
    * arithmetic end-to-end — both engines agree bit-for-bit where
    * float log-odds would not). */
  val QmScale = 1000000L

  /** Hashed-feature bucket of a token: low 32 md5 bits mod `buckets`.
    * md5 because both engines compute it identically (the `sampleHash`
    * idiom); feature hashing bounds the model at `buckets` rows no
    * matter how large the real-corpus vocabulary grows — the fastText
    * trick that makes the model broadcastable at any scale. */
  def tokenBucket(tok: Column, buckets: Int): Column =
    conv(substring(md5(tok), 1, 8), 16, 10).cast("long") % buckets

  /** Train the quality filter from labeled docs (fastText/CCNet-style
    * doc-quality gate, reduced to its deterministic core — a learned
    * BAD-VOCABULARY set): per hashed token bucket, the Laplace-smoothed
    * positive purity (pos+1)·S // (tot+2); buckets whose purity falls
    * below HALF the corpus prior are the learned bad vocabulary —
    * tokens that appear overwhelmingly in negative (low-quality) docs.
    * Log-free fixed-point NB posterior → engine-exact; one token-bucket
    * aggregate (output bounded by `buckets`), one scalar prior — the
    * whole model is a broadcastable handful of rows at any corpus
    * size. Returns (bucket, purity). */
  def trainQualityModel(docs: DataFrame, textCol: String, labelCol: String,
                        buckets: Int = 256): DataFrame = {
    val tok = docs
      .select(col(labelCol).cast("boolean").as("__l"),
        explode(words(col(textCol))).as("__t"))
      .select(col("__l"), tokenBucket(col("__t"), buckets).as("bucket"))
    // DECIMAL(38,0) for the fixed-point scale-up: token counts beyond
    // ~9.2e12 would wrap a Long at ·10^6 (the 100 TB regime this file
    // targets); div returns Long
    val per = tok.groupBy("bucket").agg(
      sum(when(col("__l"), 1L).otherwise(0L)).as("__pos"),
      count(lit(1)).as("__tot"))
    val prior = tok.agg(
      sum(when(col("__l"), 1L).otherwise(0L)).as("__posall"),
      count(lit(1)).as("__totall"))
      .select(expr(s"CAST(__posall + 1 AS DECIMAL(38,0)) * $QmScale div (__totall + 2)")
        .as("prior"))
    per.crossJoin(broadcast(prior))
      .select(col("bucket"),
        expr(s"CAST(__pos + 1 AS DECIMAL(38,0)) * $QmScale div (__tot + 2)").as("purity"),
        col("prior"),
        // the model carries its own feature-space size: scoring derives
        // it from here, so train/score can never silently disagree
        lit(buckets).as("buckets"))
  }

  /** Score docs against the trained model: per doc, the fraction of
    * tokens landing in learned bad buckets (purity < prior/2), fixed
    * point; `pred` = no bad token at all — the quality gate. The model
    * side is a broadcast join (≤ buckets rows); unseen buckets are
    * neutral by construction (absent from the bad set); the feature-
    * space size comes FROM the model (one metadata-sized head read —
    * train/score cannot silently disagree on it). Zero-token docs get
    * a verdict too (n_tokens 0, no bad evidence → pred true) — a
    * quality gate must rule on every doc. Map-only + one doc-keyed
    * aggregate: the 100 TB shape. */
  def qualityScore(docs: DataFrame, textCol: String, idCol: String,
                   model: DataFrame): DataFrame = {
    // take(1): an EMPTY model (token-less training corpus) has no bad
    // vocabulary — every doc must still get a verdict, not a crash
    val buckets = model.select("buckets").take(1).headOption
      .map(_.getInt(0)).getOrElse(1)
    val bad = model.filter(col("purity") < expr("prior div 2")).select("bucket")
    val scored = docs
      .select(col(idCol).as("id"), explode(words(col(textCol))).as("__t"))
      .select(col("id"), tokenBucket(col("__t"), buckets).as("bucket"))
      .join(broadcast(bad.withColumn("__bad", lit(1L))), Seq("bucket"), "left")
      .groupBy("id").agg(
        count(lit(1)).as("__nt"),
        sum(coalesce(col("__bad"), lit(0L))).as("__nf"))
    docs.select(col(idCol).as("id")).distinct()
      .join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("__nt"), lit(0L)).as("n_tokens"),
        coalesce(col("__nf"), lit(0L)).as("n_flagged"))
      .select(col("id"), col("n_tokens"), col("n_flagged"),
        expr(s"(n_flagged * $QmScale div greatest(n_tokens, 1)) / $QmScale.0D").as("bad_frac"),
        (col("n_flagged") === 0L).as("pred"))
  }

  // --- unigram-LM surprisal (x10) ----------------------------------------

  /** Train the unigram language model behind the surprisal filter
    * (CCNet's LM-perplexity corpus scoring, Wenzek 2019, reduced to
    * its deterministic core): per hashed token bucket, the corpus
    * occurrence count. Feature hashing (the x9 trick) bounds the model
    * at `buckets` rows whatever the real vocabulary — one token-bucket
    * aggregate, broadcastable at any corpus size. Each row carries the
    * corpus total and the bucket count (`buckets` rows, each with
    * `cnt` and `total`), so scoring derives everything FROM the model. */
  def trainUnigramModel(docs: DataFrame, textCol: String,
                        buckets: Int = 4096): DataFrame = {
    val tok = docs.select(explode(words(col(textCol))).as("__t"))
      .select(tokenBucket(col("__t"), buckets).as("bucket"))
    val per = tok.groupBy("bucket").agg(count(lit(1)).as("cnt"))
    val tot = tok.agg(count(lit(1)).as("total"))
    per.crossJoin(broadcast(tot))
      .select(col("bucket"), col("cnt"), col("total"),
        lit(buckets).as("buckets"))
  }

  /** Score docs by mean token SURPRISAL under the trained unigram
    * model — the perplexity-style quality signal, integerized so both
    * engines agree bit-for-bit: a token's surprisal is the INTEGER
    * log2 of its inverse frequency, bits(total div cnt) where bits(x)
    * = length of x's binary form = floor(log2 x)+1 — no float log
    * anywhere (64−nlz over the model rows here, the identical
    * `length(bin(..))` in DuckDB). Common tokens score ~1 bit, tokens
    * unseen by the model score bits(total) — the Laplace-style
    * worst case. Per doc: token count, total bits, and the fixed-point
    * mean (·10⁶) — gate on `mean_bits_fp` exactly as CCNet gates on
    * perplexity. Model side is a broadcast join (≤ buckets rows);
    * map-only + one doc-keyed aggregate — the 100 TB shape. Zero-token
    * docs get a row (all zeros): a corpus filter must rule on every
    * doc. */
  def surprisalScore(docs: DataFrame, textCol: String, idCol: String,
                     model: DataFrame): DataFrame = {
    // ONE model materialization (≤ buckets rows — the codebook-collect
    // class of driver read): buckets/total/per-bucket bits all derive
    // from it, so the training aggregation runs exactly once however
    // many plan legs consume it. bits(x) = 64−nlz(x) = floor(log2 x)+1
    // — the same integer log2 as length(bin(x)) on either engine.
    val rows = model.select(col("bucket"), col("cnt"), col("total"),
      col("buckets")).collect()
    def bits(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    // empty model (token-less training corpus): no vocabulary, no
    // total — every token scores 0 bits, and the gate still rules
    val buckets = if (rows.isEmpty) 1 else rows.head.getInt(3)
    val worstBits = if (rows.isEmpty) 0L else bits(rows.head.getLong(2))
    val spark = docs.sparkSession
    import spark.implicits._
    val bitsDf = rows.toSeq
      .map(r => (r.getLong(0), bits(r.getLong(2) / r.getLong(1))))
      .toDF("bucket", "__bits")
    val scored = docs
      .select(col(idCol).as("id"), explode(words(col(textCol))).as("__t"))
      .select(col("id"), tokenBucket(col("__t"), buckets).as("bucket"))
      .join(broadcast(bitsDf), Seq("bucket"), "left")
      .withColumn("__b", coalesce(col("__bits"), lit(worstBits)))
      .groupBy("id").agg(
        count(lit(1)).as("n_tokens"),
        sum(col("__b")).as("sum_bits"))
    docs.select(col(idCol).as("id")).distinct()
      .join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("sum_bits"), lit(0L)).as("sum_bits"))
      .select(col("id"), col("n_tokens"), col("sum_bits"),
        expr(s"sum_bits * $QmScale div greatest(n_tokens, 1)").as("mean_bits_fp"))
  }

  // --- length-bucketed batching (p26) --------------------------------------

  /** Padding-minimizing LENGTH-BUCKETED batching (the classic seq2seq
    * "bucketing" / dynamic-batching step, public since Sutskever-era
    * trainers): sequences are grouped by length bucket so a batch pads
    * every member only to its own longest sequence, not the corpus
    * max. bucket = (len−1) div bucketWidth; within a bucket, sequences
    * rank by (len desc, id) and every `batchSize` consecutive ranks
    * form a batch. Emits one row per batch with its padding account:
    * `n_seqs`, `max_len`, `sum_len`, `padded_tokens` = max_len·n_seqs
    * (what the trainer allocates), and `waste_fp` = the padded-but-
    * empty fraction in ·10⁶ fixed point — the number a team compares
    * against the unbucketed baseline to size `bucketWidth`.
    *
    * The rank is SHARDED, not global (the [[packSequences]]
    * discipline): shard = id div shardSize, the window partitions on
    * (bucket, shard) — so every sort is bounded by shardSize docs
    * regardless of corpus size and shards batch in parallel after one
    * uniform shuffle; the global per-bucket rank a single window would
    * need (one task, 100 TB through it) never exists. The boundary
    * cost is at most one partly-filled batch per (bucket, shard) —
    * amortized exactly like the packer's partly-empty final bin.
    * Non-positive lengths drop (a batcher feeds a trainer; there is
    * nothing to pad), documented rather than padded. The per-batch
    * aggregate is map-side combinable on the window's own
    * partitioning, so it adds no second shuffle. */
  def lengthBucketBatches(docs: DataFrame, idCol: String, lenCol: String,
                          bucketWidth: Long, batchSize: Long,
                          shardSize: Long): DataFrame = {
    require(bucketWidth > 0 && batchSize > 0 && shardSize > 0)
    requireFresh(docs, "bucket", "shard", "batch")
    import org.apache.spark.sql.expressions.Window
    val bucketed = docs
      .filter(col(lenCol) > 0L)
      .select(col(idCol).as("__id"), col(lenCol).cast("long").as("__len"))
      .withColumn("bucket", expr(s"(__len - 1) div $bucketWidth").cast("long"))
      .withColumn("shard", expr(s"__id div $shardSize").cast("long"))
    val rn = row_number().over(
      Window.partitionBy(col("bucket"), col("shard"))
        .orderBy(col("__len").desc, col("__id")))
    bucketed
      .withColumn("__rn", rn.cast("long"))
      .withColumn("batch", expr(s"(__rn - 1) div $batchSize").cast("long"))
      .groupBy("bucket", "shard", "batch").agg(
        count(lit(1)).as("n_seqs"),
        max(col("__len")).as("max_len"),
        sum(col("__len")).as("sum_len"))
      .select(col("bucket"), col("shard"), col("batch"),
        col("n_seqs"), col("max_len"), col("sum_len"),
        (col("max_len") * col("n_seqs")).as("padded_tokens"))
      .withColumn("waste_fp",
        expr(s"(padded_tokens - sum_len) * $QmScale div padded_tokens"))
  }

  // --- sliding-window chunking (x21) ----------------------------------------

  /** Sliding token-WINDOW chunking of long documents (the standard
    * long-document handling step — context-window slicing with overlap
    * for embedding/indexing pipelines): windows of `window` tokens
    * starting every `stride` tokens, the last window clipped to the
    * document end, and no start past the end — a doc with n tokens
    * yields 1 + max(0, ceil((n−window)/stride)) chunks, so every token
    * is covered and no chunk is a strict suffix-duplicate of its
    * predecessor. Emits (id, chunk_idx, start_tok, n_tok, chunk_text)
    * with chunk_text re-joined on single spaces (the [[words]]
    * normalization — chunk text is in TOKEN space, the form the
    * embedder consumes). Zero-token docs yield no chunks (chunking is
    * an expansion, not a filter — the corpus-must-rule contract
    * belongs to the gates that run before it). One higher-order
    * transform + explode over the staged `__ws` — map-only, no
    * shuffle: the 100 TB shape is the scan itself. */
  def chunkWindows(docs: DataFrame, textCol: String, idCol: String,
                   window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    docs
      .select(col(idCol).as("id"), words(col(textCol)).as("__ws"))
      .withColumn("__n", size(col("__ws")).cast("long"))
      .filter(col("__n") > 0L)
      .select(col("id"), col("__ws"), col("__n"),
        explode(expr(
          s"sequence(0L, (CASE WHEN __n <= $window THEN 0L " +
            s"ELSE (__n - $window + $stride - 1) div $stride END))")).as("chunk_idx"))
      .select(col("id"), col("chunk_idx"),
        (col("chunk_idx") * stride).as("start_tok"),
        least(lit(window).cast("long"), col("__n") - col("chunk_idx") * stride).as("n_tok"),
        expr(s"concat_ws(' ', slice(__ws, chunk_idx * $stride + 1, $window))").as("chunk_text"))
  }

  // --- bigram-LM surprisal (x20) ------------------------------------------

  /** Consecutive (prev, cur) token pairs of a staged `__ws` word array,
    * BOS included: position 0 pairs the first token with a NULL
    * context (bucketed to the −1 BOS sentinel at the call site), every
    * later position pairs a token with its predecessor. One per-row
    * higher-order transform — map-only, the pair stream never
    * re-tokenizes (the `__ws` staging idiom). Shared by train and
    * score so the two sides see the identical pair space. */
  private def bucketPairs: Column =
    // (x, i) -> (prev = __ws[i-1] or NULL at i=0, cur = x); element_at
    // is 1-based so element_at(__ws, i) IS the 0-based predecessor of x
    expr(
      "transform(__ws, (x, i) -> struct(" +
        "CASE WHEN i = 0 THEN CAST(NULL AS STRING) ELSE element_at(__ws, i) END AS prev, " +
        "x AS cur))")

  /** The hashed (pb, cb) pair stream every bigram-LM leg consumes (exposed private[graft] for the equivalence spec) —
    * kernelized ([[graft.functions.BigramBuckets]]: one md5 per token,
    * binary digest head, prev bucket carried in a register; the
    * declarative transform+double-tokenBucket route paid two hex-string
    * hash chains per pair position). `idCol` None = train shape (no
    * doc key). */
  private[graft] def pairStreamKernel(docs: DataFrame, textCol: String, idCol: Option[String],
                                      buckets: Int): DataFrame = {
    val base = idCol match {
      case Some(c) => docs.select(col(c).as("id"), words(col(textCol)).as("__ws"))
      case None    => docs.select(words(col(textCol)).as("__ws"))
    }
    val keep = idCol.map(_ => col("id")).toSeq
    base.select(keep :+
        explode(graft.functions.TextKernels.bigramBuckets(col("__ws"), buckets)).as("p"): _*)
      .select(keep ++ Seq(col("p.pb").as("pb"), col("p.cb").as("cb")): _*)
  }

  /** The declarative twin of [[pairStreamKernel]] — kept ONLY as the
    * equivalence oracle for the kernel's property spec (the
    * wordsRegex/ngramsRegex discipline). */
  private[graft] def pairStreamDeclarative(docs: DataFrame, textCol: String,
                                           idCol: Option[String], buckets: Int): DataFrame = {
    val base = idCol match {
      case Some(c) => docs.select(col(c).as("id"), words(col(textCol)).as("__ws"))
      case None    => docs.select(words(col(textCol)).as("__ws"))
    }
    val keep = idCol.map(_ => col("id")).toSeq
    base.select(keep :+ explode(bucketPairs).as("p"): _*)
      .select(keep ++ Seq(
        coalesce(tokenBucket(col("p.prev"), buckets), lit(-1L)).as("pb"),
        tokenBucket(col("p.cur"), buckets).as("cb")): _*)
  }

  /** Train the bigram language model behind the contextual surprisal
    * filter (CCNet's reference-corpus LM scoring, Wenzek 2019, reduced
    * to its deterministic core — KenLM's n-gram conditioning without
    * the float arithmetic): per (context bucket, token bucket) hashed
    * pair, the corpus co-occurrence count, with −1 as the BOS context
    * so the first token of every document is conditioned too. Feature
    * hashing (the x9/x10 trick) bounds the model at ≤ buckets²+buckets
    * rows whatever the real vocabulary — one pair-bucket aggregate,
    * broadcastable at any corpus size (≤ ~1M rows at the default
    * 1024). The unigram backoff model is CONTAINED in the pair table
    * (a token's unigram count = Σ over its contexts; the corpus total
    * = Σ over all pairs), so one DataFrame carries the whole model. */
  def trainBigramModel(docs: DataFrame, textCol: String,
                       buckets: Int = 1024): DataFrame = {
    pairStreamKernel(docs, textCol, None, buckets)
      .groupBy("pb", "cb").agg(count(lit(1)).as("cnt"))
      .withColumn("buckets", lit(buckets))
  }

  /** Score docs by mean token surprisal under the trained BIGRAM model
    * — the context-sensitive upgrade of [[surprisalScore]], integerized
    * so both engines agree bit-for-bit. A token's surprisal given its
    * predecessor:
    *
    *   - seen pair:      bits(ctx_cnt div cnt)   — the conditional
    *     inverse frequency P(cur|prev)⁻¹, integer log2
    *   - unseen pair:    1 + bits(total div ucnt) — Katz-style backoff
    *     to the unigram leg, the +1 bit the discount
    *   - unseen token:   1 + bits(total)          — the worst case
    *
    * with bits(x) = floor(log2 x)+1 = `length(bin(x))` on either
    * engine — no float log anywhere. Trained on a REFERENCE slice and
    * scored corpus-wide (the CCNet deployment shape: in-domain text
    * rides cheap seen-pair bits, out-of-domain text pays the backoff),
    * this is the gate a data team tunes by `mean_bits_fp` exactly as
    * CCNet gates on LM perplexity. All model legs (pair bits, unigram
    * backoff, worst case) are tiny aggregates of the bounded pair
    * table, broadcast-joined — the corpus pays one map-only pair pass
    * and one doc-keyed aggregate, the 100 TB shape. Zero-token docs
    * get an all-zero row: a corpus filter must rule on every doc. */
  /** The three broadcastable scoring legs a trained bigram model
    * expands into (all tiny aggregates of the bounded pair table):
    * per-pair conditional bits, per-token unigram backoff bits, and
    * the 1-row worst-case/empty flag. `suffix` disambiguates columns
    * when two models join onto ONE pair stream ([[crossEntropyDiff]]).
    * Returns (buckets, pairBits, uniBits, worst) — buckets read from
    * the model (the x10 model-carried-feature-space contract; a 1-row
    * driver read, the codebook-collect class). */
  private def bigramModelLegs(model: DataFrame, suffix: String)
      : (Option[Int], DataFrame, DataFrame, DataFrame) = {
    val head = model.select(col("buckets")).limit(1).collect()
    // an EMPTY model (zero-row reference corpus) has no rows to carry
    // its feature space — return None so callers can resolve buckets
    // from elsewhere (the OTHER model in crossEntropyDiff) instead of
    // tripping a spurious feature-space mismatch; the scoring legs are
    // all-empty either way and every token rides the __empty flag
    val buckets = if (head.isEmpty) None else Some(head(0).getInt(0))
    val pair = model.select(col("pb"), col("cb"), col("cnt"))
    val ctx = pair.groupBy("pb").agg(sum(col("cnt")).as("ctx_cnt"))
    val uni = pair.groupBy("cb").agg(sum(col("cnt")).as("ucnt"))
    val tot = pair.agg(coalesce(sum(col("cnt")), lit(0L)).as("total"))
    val pairBits = pair.join(ctx, Seq("pb"))
      .select(col("pb"), col("cb"),
        length(bin(expr("ctx_cnt div cnt"))).cast("long").as(s"__pair_bits$suffix"))
    val uniBits = uni.crossJoin(broadcast(tot))
      .select(col("cb"),
        (lit(1L) + length(bin(expr("total div ucnt"))).cast("long")).as(s"__uni_bits$suffix"))
    // worst case + the empty-model flag ride ONE broadcast row: an
    // empty reference corpus has no vocabulary and no total — every
    // token scores 0 bits and the gate still rules on every doc
    val worst = tot.select(
      when(col("total") > 0L,
        lit(1L) + length(bin(col("total"))).cast("long"))
        .otherwise(lit(0L)).as(s"__worst_bits$suffix"),
      (col("total") === 0L).as(s"__empty$suffix"))
    (buckets, pairBits, uniBits, worst)
  }

  def bigramSurprisal(docs: DataFrame, textCol: String, idCol: String,
                      model: DataFrame): DataFrame = {
    val (bOpt, pairBits, uniBits, worst) = bigramModelLegs(model, "")
    // empty model: bucket choice is immaterial (every token scores 0
    // via the __empty flag) — any positive value tokenizes validly
    val buckets = bOpt.getOrElse(1)
    val toks = pairStreamKernel(docs, textCol, Some(idCol), buckets)
    val scored = toks
      .join(broadcast(pairBits), Seq("pb", "cb"), "left")
      .join(broadcast(uniBits), Seq("cb"), "left")
      .crossJoin(broadcast(worst))
      .withColumn("__b",
        when(col("__empty"), lit(0L))
          .otherwise(coalesce(col("__pair_bits"), col("__uni_bits"),
            col("__worst_bits"))))
      .groupBy("id").agg(
        count(lit(1)).as("n_tokens"),
        sum(col("__b")).as("sum_bits"))
    docs.select(col(idCol).as("id")).distinct()
      .join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("sum_bits"), lit(0L)).as("sum_bits"))
      .select(col("id"), col("n_tokens"), col("sum_bits"),
        expr(s"sum_bits * $QmScale div greatest(n_tokens, 1)").as("mean_bits_fp"))
  }

  /** CROSS-ENTROPY DIFFERENCE data selection (Moore–Lewis 2010 —
    * "Intelligent Selection of Language Model Training Data" — the
    * log-likelihood-ratio scorer modern hashed-feature selectors like
    * DSIR, Xie 2023, reduce to): every doc scores
    *
    *   diff_bits = H_out(doc) − H_in(doc)
    *
    * — its total surprisal under the OUT-of-domain (general/raw) LM
    * minus under the IN-domain (target) LM, both the integerized
    * bigram models of [[trainBigramModel]]. A doc the in-domain model
    * predicts more cheaply than the general model scores positive —
    * text that looks like the target domain relative to the pool —
    * and `selected` = (diff_bits > 0) is the Moore–Lewis gate
    * (threshold 0 = "more in-domain than out"; a deployment tunes the
    * cut on `diff_fp`, the per-token fixed-point mean).
    *
    * ONE pair pass over the corpus: both models' legs broadcast onto
    * the same token-pair stream (six bounded-table joins), then one
    * doc-keyed aggregate — the same 100 TB shape as
    * [[bigramSurprisal]], paid once, not twice. Both models must share
    * the feature space (equal `buckets` — required loudly). Zero-token
    * docs rule as NOT selected with all-zero scores. */
  def crossEntropyDiff(docs: DataFrame, textCol: String, idCol: String,
                       inModel: DataFrame, outModel: DataFrame): DataFrame = {
    val (bInOpt, pIn, uIn, wIn) = bigramModelLegs(inModel, "_in")
    val (bOutOpt, pOut, uOut, wOut) = bigramModelLegs(outModel, "_out")
    // an empty model rules every token 0 bits in ANY feature space, so
    // it adopts the other side's buckets; the mismatch guard fires only
    // on two genuinely incompatible trainings
    require(bInOpt.isEmpty || bOutOpt.isEmpty || bInOpt == bOutOpt,
      s"models trained in different feature spaces: ${bInOpt.get} vs ${bOutOpt.get} buckets")
    val bIn = bInOpt.orElse(bOutOpt).getOrElse(1)
    val toks = pairStreamKernel(docs, textCol, Some(idCol), bIn)
    val scored = toks
      .join(broadcast(pIn), Seq("pb", "cb"), "left")
      .join(broadcast(uIn), Seq("cb"), "left")
      .crossJoin(broadcast(wIn))
      .join(broadcast(pOut), Seq("pb", "cb"), "left")
      .join(broadcast(uOut), Seq("cb"), "left")
      .crossJoin(broadcast(wOut))
      .withColumn("__bi",
        when(col("__empty_in"), lit(0L))
          .otherwise(coalesce(col("__pair_bits_in"), col("__uni_bits_in"),
            col("__worst_bits_in"))))
      .withColumn("__bo",
        when(col("__empty_out"), lit(0L))
          .otherwise(coalesce(col("__pair_bits_out"), col("__uni_bits_out"),
            col("__worst_bits_out"))))
      .groupBy("id").agg(
        count(lit(1)).as("n_tokens"),
        sum(col("__bi")).as("in_bits"),
        sum(col("__bo")).as("out_bits"))
    docs.select(col(idCol).as("id")).distinct()
      .join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("in_bits"), lit(0L)).as("in_bits"),
        coalesce(col("out_bits"), lit(0L)).as("out_bits"))
      .withColumn("diff_bits", col("out_bits") - col("in_bits"))
      .withColumn("diff_fp",
        expr(s"diff_bits * $QmScale div greatest(n_tokens, 1)"))
      .withColumn("selected", col("diff_bits") > 0L)
  }
}
