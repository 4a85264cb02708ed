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
