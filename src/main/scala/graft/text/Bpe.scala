package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenization for corpus budget accounting — the
  * vocab-driven upgrade of `TextAnalysis.tokenCounts`' regex heuristic
  * (mixture/budget math downstream of a training-data pipeline counts
  * REAL tokenizer tokens, not word shapes). BPE itself is public
  * (Sennrich et al. 2016, arXiv:1508.07909; the GPT-2 tokenizer applies
  * the same merge loop); no tokenizer code was consulted.
  *
  * Two halves, matching the PQ codebook discipline:
  *  - `train`: learn a merges table FROM the corpus — each round is one
  *    weighted pair-count aggregate over the (vocabulary-sized) word
  *    table plus a 1-row argmax; the per-word symbol arrays update
  *    map-side. Deterministic: integer counts, lexicographic
  *    tie-breaks — the same table on any engine/partitioning.
  *  - `tokenCounts`: count tokens under a FIXED merges table with the
  *    codegen'd `BpeCount` kernel — one map-only projection over the
  *    corpus scan, the 100 TB shape (the vocab rides the closure like
  *    `PqEncode`'s codebook; nothing joins, nothing shuffles).
  *
  * Apply semantics are rank-order sweeps with left-to-right
  * non-overlapping merges (see `BpeCount`), mirrored EXACTLY by the
  * SQL `replace` chain `mergeChainSql` builds — which is what makes
  * x8 DuckDB-oracle-checkable end to end.
  */
object Bpe {

  /** Learn `numMerges` merges from a corpus. Stops early when no pair
    * occurs twice. Training runs over the DISTINCT-word frequency
    * table (vocabulary-sized — the corpus text is scanned once), with
    * one tiny argmax collect per round, the `clusters` convergence-
    * counter discipline. Pair statistics count every adjacent
    * occurrence (the classic Sennrich get_stats). */
  def train(docs: DataFrame, textCol: String, numMerges: Int): Seq[(String, String)] = {
    val chars = transform(sequence(lit(1), length(col("w"))),
      i => col("w").substr(i, lit(1)))
    var vocab = graft.core.Checkpoints.truncate(
      docs.select(explode(TextAnalysis.words(col(textCol))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("freq"))
        .select(col("freq"), chars.as("syms")))
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var round = 0
    while (round < numMerges && !done) {
      val pairs = vocab.filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(transform(sequence(lit(0), size(col("syms")) - 2),
          i => struct(element_at(col("syms"), i + 1).as("a"),
            element_at(col("syms"), i + 2).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
      val best = pairs.orderBy(col("cnt").desc, col("a"), col("b")).limit(1).collect()
      if (best.isEmpty || best(0).getLong(2) < 2) done = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += ((a, b))
        vocab = graft.core.Checkpoints.truncate(
          vocab.withColumn("syms", applyMerge(col("syms"), a, b)))
      }
      round += 1
    }
    merges.result()
  }

  /** Learn `numMerges` merges at REALISTIC vocab sizes (4k–100k): the
    * corpus scan distributes (one word-frequency aggregate — the only
    * data-sized pass), then the classic in-memory merge loop runs
    * driver-side over the VOCABULARY-sized frequency table with
    * incremental pair-count maintenance — the same
    * model-fit-on-a-metadata-sized-head discipline as the PQ codebook
    * and the x9 model. `train` pays one distributed aggregate + one
    * checkpoint PER ROUND (fine at 64 merges, ruinous at 32k);
    * this runs rounds at in-memory speed and produces the IDENTICAL
    * merges table (same pair statistics, same cnt-desc/lexicographic
    * argmax, same ≥2 stop — spec-pinned equality against `train`).
    *
    * Driver memory is O(vocabulary), BOUNDED BY CONSTRUCTION: the
    * collect runs under `limit(maxVocab + 1)` — the driver can never
    * receive more than maxVocab + 1 rows, whatever the corpus — and
    * overflowing the cap is a LOUD error, not an OOM: a web-scale
    * corpus has billions of distinct "words" (typo/URL/hash junk),
    * and the caller must cut them with `minFreq` (hapax words can't
    * win a merge against the ≥2 stop unless the vocabulary is tiny —
    * the standard trainer cut) or consciously raise `maxVocab`
    * (~4M words ≈ low-hundreds MB driver heap at the default). */
  def trainFast(docs: DataFrame, textCol: String, numMerges: Int,
                minFreq: Long = 1L, maxVocab: Int = 4000000): Seq[(String, String)] = {
    require(maxVocab > 0 && maxVocab < Int.MaxValue)
    val wf: Array[(String, Long)] = docs
      .select(explode(TextAnalysis.words(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minFreq)
      .limit(maxVocab + 1)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    require(wf.length <= maxVocab,
      s"corpus vocabulary exceeds maxVocab = $maxVocab at minFreq = $minFreq — " +
        "raise minFreq (junk words never win merges) or, deliberately, maxVocab")
    trainOnCounts(wf, numMerges)
  }

  /** The classic in-memory merge loop over a word-frequency table —
    * `trainFast`'s driver half, exposed so scale probes can feed
    * synthetic vocabularies directly. Identical statistics and argmax
    * order to `train` (every adjacent occurrence weighted by word
    * freq; cnt desc then lexicographic (a, b); stop below 2).
    * Selection is a LAZY-DELETION max-heap: every count change pushes
    * a fresh snapshot and stale snapshots are discarded at pop time —
    * O(log #pairs) a round instead of a full pair-table scan, which
    * is what makes 32k+ merge rounds driver-practical. */
  def trainOnCounts(wf: Array[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    import scala.collection.mutable
    val syms: Array[mutable.ArrayBuffer[String]] =
      wf.map { case (w, _) => mutable.ArrayBuffer(w.map(String.valueOf(_)): _*) }
    val freq = wf.map(_._2)
    def pairsOf(s: mutable.ArrayBuffer[String]): Iterator[(String, String)] =
      if (s.length < 2) Iterator.empty
      else (0 until s.length - 1).iterator.map(i => (s(i), s(i + 1)))
    val counts = mutable.HashMap.empty[(String, String), Long]
    val where = mutable.HashMap.empty[(String, String), mutable.BitSet]
    // heap order: count DESC, then (a, b) ASC — train's exact argmax
    implicit val ord: Ordering[(Long, String, String)] =
      new Ordering[(Long, String, String)] {
        def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
          val c = java.lang.Long.compare(x._1, y._1)
          if (c != 0) c
          else {
            val a = y._2.compareTo(x._2)
            if (a != 0) a else y._3.compareTo(x._3)
          }
        }
      }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)]
    def bump(p: (String, String), delta: Long): Unit = {
      val c = counts.getOrElse(p, 0L) + delta
      if (c <= 0L) counts.remove(p)
      else { counts.update(p, c); heap.enqueue((c, p._1, p._2)) }
    }
    syms.indices.foreach { i =>
      pairsOf(syms(i)).foreach { p =>
        bump(p, freq(i))
        where.getOrElseUpdate(p, mutable.BitSet.empty) += i
      }
    }
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      // pop until a LIVE snapshot (count matches the map) surfaces;
      // a live top below 2 means no pair qualifies anywhere — every
      // current count was pushed when set, so the heap top bounds the
      // true maximum
      var best: (String, String) = null
      var stop = false
      while (best == null && !stop) {
        if (heap.isEmpty) stop = true
        else {
          val (c, a, b) = heap.dequeue()
          if (c < 2L) stop = true
          else if (counts.getOrElse((a, b), 0L) == c) best = (a, b)
        }
      }
      if (best == null) done = true
      else {
        merges += best
        val (a, b) = best
        val ab = a + b
        for (i <- where.getOrElse(best, mutable.BitSet.empty)) {
          val s = syms(i)
          // exact delta: retract the word's old pair multiset, apply
          // the left-to-right non-overlapping sweep, add the new one —
          // identical statistics to train's full per-round recount
          pairsOf(s).foreach(p => bump(p, -freq(i)))
          val out = mutable.ArrayBuffer.empty[String]
          s.foreach { t =>
            if (out.nonEmpty && out.last == a && t == b) out(out.length - 1) = ab
            else out += t
          }
          syms(i) = out
          pairsOf(out).foreach { p =>
            bump(p, freq(i))
            where.getOrElseUpdate(p, mutable.BitSet.empty) += i
          }
        }
        where.remove(best)
      }
      round += 1
    }
    merges.result()
  }

  /** One left-to-right non-overlapping sweep of merge (a, b) over a
    * symbol array — the declarative twin of `BpeCount`'s fold (used by
    * training, where the array column updates map-side per round). */
  private def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, s) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** Token count column over a words array under `merges` — the
    * codegen'd map-only kernel. */
  def bpeCount(ws: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.BpeCount(ColumnBridge.expr(ws),
      merges.map { case (a, b) => Array(a, b, a + b) }.toArray))
  }

  /** [[bpeCount]] under the byte-level alphabet — the counting shadow
    * of [[bpeEncodeBytes]] (shared UTF-8 byte mapping AND shared
    * segmentation loop), so `size(bpeEncodeBytes(ws)) ==
    * bpeCountBytes(ws)` holds for ANY text, non-ASCII included. */
  def bpeCountBytes(ws: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.BpeCount(ColumnBridge.expr(ws),
      merges.map { case (a, b) => Array(a, b, a + b) }.toArray, byteBase = true))
  }

  /** Flat token-ID sequence column over a words array — the encoder
    * twin of `bpeCount` (shared segmentation loop, so
    * `size(bpeEncode(ws)) == bpeCount(ws)` always). Vocab id
    * contract on [[graft.functions.BpeEncodeIds]]: 0–35 the fixed
    * base alphabet, 36+r for merge r. */
  def bpeEncode(ws: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.BpeEncodeIds(ColumnBridge.expr(ws),
      merges.map { case (a, b) => Array(a, b, a + b) }.toArray))
  }

  /** [[bpeEncode]] under the BYTE-LEVEL id contract: each word is
    * UTF-8-encoded first, base ids 0–255 are the byte values, merge r
    * gets 256 + r — the GPT-2-style base that serves ANY text (a
    * multi-byte char decomposes into its UTF-8 bytes; nothing is ever
    * out-of-vocab) without a per-deployment alphabet. For ASCII input
    * — e.g. `TextAnalysis.words` output — byte ids coincide with char
    * codes, which is what keeps the DuckDB `ord()` oracle exact. The
    * realistic deployment shape for the deep vocabularies `trainFast`
    * produces — see [[DeepMerges]]. Counting shadow: [[bpeCountBytes]]
    * (same byte mapping, same loop — length ≡ count for any text). */
  def bpeEncodeBytes(ws: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.BpeEncodeIds(ColumnBridge.expr(ws),
      merges.map { case (a, b) => Array(a, b, a + b) }.toArray, byteBase = true))
  }

  /** A DEEP merges table (4096 merges) trained by `trainFast` on the
    * deterministic deep corpus [[deepCorpus]] builds — the synthetic
    * documents corpus's own BPE closure exhausts in double-digit
    * merges (31 distinct words at sf0.01), so the realistic-vocab
    * encode regime trains on a corpus with a deep vocabulary and
    * applies the table to the real corpus (exactly the deployment:
    * GPT-2's merges weren't trained on your data either). Checked in
    * as a resource so the x13 query and its oracle share one literal
    * vocab; regenerate with `runMain graft.TrainBpe deep`. */
  lazy val DeepMerges: Seq[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges_deep.tsv")
    require(in != null, "resource graft/bpe_merges_deep.tsv missing — run `runMain graft.TrainBpe deep`")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().filter(_.nonEmpty).map { line =>
      val t = line.split('\t')
      require(t.length == 2, s"malformed merges line: $line")
      (t(0), t(1))
    }.toVector
    finally src.close()
  }

  /** The deterministic deep-vocabulary training corpus behind
    * [[DeepMerges]]: 60k seeded-random [a-z] words with harmonic
    * (Zipf) frequencies, one doc per word carrying `freq` repetitions
    * — rich shared substructure sustains tens of thousands of merges
    * where the synthetic word-salad corpus saturates. Built as a real
    * distributed DataFrame so `trainFast` exercises its corpus pass. */
  def deepCorpus(spark: org.apache.spark.sql.SparkSession,
                 n: Int = 60000, seed: Long = 42L): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val vocab = IndexedSeq.tabulate(n) { i =>
      val w = (0 until (3 + rnd.nextInt(10)))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      (i.toLong, w, math.max(1L, 200000L / (i + 1L)))
    }
    import spark.implicits._
    vocab.toDF("doc_id", "w", "freq")
      .repartition(32)
      .select(col("doc_id"),
        array_join(transform(sequence(lit(1L), col("freq")), _ => col("w")), " ")
          .as("text"))
  }

  /** Per-doc token counts under a fixed merges table: (id, n_words,
    * bpe_tokens). Pure projection over the corpus scan — zero
    * shuffle. */
  def tokenCounts(docs: DataFrame, textCol: String, idCol: String,
                  merges: Seq[(String, String)]): DataFrame =
    docs.select(col(idCol),
      size(TextAnalysis.words(col(textCol))).cast("long").as("n_words"),
      bpeCount(TextAnalysis.words(col(textCol)), merges).as("bpe_tokens"))

  /** The SQL expression applying the same merges to a word column `c`:
    * wrap each character as `(c)`, then one `replace` per merge in
    * rank order — `replace`'s left-to-right non-overlapping scan is
    * exactly `BpeCount`'s sweep. Token count = count of '('. */
  def mergeChainSql(c: String, merges: Seq[(String, String)]): String =
    merges.foldLeft(s"regexp_replace($c, '(.)', '(\\1)', 'g')") {
      case (e, (a, b)) => s"replace($e, '($a)($b)', '(${a + b})')"
    }

  /** The default merges table: 64 merges trained by `train` on the
    * driver-generated documents corpus (sf0.01) — checked in so the
    * x8 query and its oracle share one LITERAL vocab (no model file
    * ships with a zero-egress build; a deployment trains its own with
    * `train` or loads a published table, e.g. the GPT-2 merges).
    * Regenerate with `runMain graft.TrainBpe`. */
  val DefaultMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("cu", "st"), ("cust", "o"),
    ("custo", "mer"), ("f", "i"), ("fi", "l"), ("fil", "t"),
    ("filt", "er"), ("a", "l"), ("al", "l"), ("m", "all"),
    ("s", "mall"), ("g", "e"), ("l", "ow"), ("mer", "ge"),
    ("s", "low"), ("c", "t"), ("ct", "or"), ("d", "er"),
    ("e", "ctor"), ("or", "der"), ("v", "ector"), ("in", "e"),
    ("l", "ine"), ("a", "b"), ("ab", "l"), ("abl", "e"),
    ("at", "a"), ("d", "ata"), ("t", "able"), ("u", "p"),
    ("a", "g"), ("ag", "g"), ("a", "lu"), ("alu", "e"),
    ("v", "alue"), ("e", "y"), ("k", "ey")
  )
}
