package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.{Bpe, TextAnalysis}

/** Realistic-vocab BPE scale proof (PERF.md):
  *
  *  1. training: the per-round distributed `train` vs the driver-local
  *     `trainFast` on the real corpus (identity + speed), then
  *     `trainOnCounts` to ≥4k merges on a synthetic Zipf vocabulary —
  *     the corpus's own BPE closure exhausts in double digits
  *     (synthetic text, bounded word shapes), so the deep-vocab
  *     regime needs a deep vocabulary;
  *  2. kernel throughput at growing vocab sizes over the REAL corpus
  *     (counting a corpus under a foreign tokenizer's vocab is
  *     exactly the deployment: GPT-2's merges weren't trained on your
  *     data either). The classic lowest-rank-first kernel must be
  *     ~flat in merge count — the literal rank-order sweep is
  *     O(merges) per word and would degrade ~linearly;
  *  3. kernel ≡ rank-order-sweep semantics (what the SQL oracle
  *     implements) at the large vocab, over every distinct corpus
  *     word.
  *
  * `runMain graft.BpeScale [sfDir] [merges]` (defaults sf0.1, 4096).
  */
object BpeScale {

  /** Plain-Scala rank-order sweep reference — the oracle's semantics
    * (mergeChainSql's replace chain), applied merge by merge. */
  def sweepCount(w: String, merges: Seq[(String, String)]): Long = {
    if (w.isEmpty) return 0L
    var cur = w.map(String.valueOf(_)).toVector
    merges.foreach { case (a, b) =>
      if (cur.length > 1) {
        val out = Vector.newBuilder[String]
        var last: String = null
        cur.foreach { s =>
          if (last == a && s == b) last = a + b
          else { if (last != null) out += last; last = s }
        }
        if (last != null) out += last
        cur = out.result()
      }
    }
    cur.length.toLong
  }

  /** Deterministic Zipf word-frequency table: `n` random [a-z] words,
    * harmonic frequencies — enough shared substructure to sustain tens
    * of thousands of merges. */
  def zipfVocab(n: Int, seed: Long = 42L): Array[(String, Long)] = {
    val rnd = new scala.util.Random(seed)
    Array.tabulate(n) { i =>
      val w = (0 until (3 + rnd.nextInt(10)))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      (w, math.max(1L, 200000L / (i + 1L)))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBig = args.lift(1).map(_.toInt).getOrElse(4096)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val nDocs = docs.count()

    // 1a. real corpus: distributed reference vs driver-local loop
    val t0 = System.nanoTime()
    val m64slow = Bpe.train(docs, "text", 64)
    val tSlow = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val m64 = Bpe.trainFast(docs, "text", 64)
    val t64 = (System.nanoTime() - t1) / 1e9
    require(m64 == m64slow, "trainFast must equal train at 64 merges")
    println(f"train($nDocs docs, 64 merges): per-round $tSlow%.1f s | driver-local $t64%.2f s")
    // 1b. deep vocab on the synthetic Zipf table
    val vocab = zipfVocab(60000)
    val t2 = System.nanoTime()
    val mBig = Bpe.trainOnCounts(vocab, nBig)
    val tBig = (System.nanoTime() - t2) / 1e9
    val t3 = System.nanoTime()
    val mHuge = Bpe.trainOnCounts(vocab, nBig * 4)
    val tHuge = (System.nanoTime() - t3) / 1e9
    println(f"trainOnCounts(60k Zipf words): ${mBig.size} merges $tBig%.1f s | ${mHuge.size} merges $tHuge%.1f s")

    // 2. kernel throughput vs vocab size (corpus-count wall time)
    val words = docs.select(TextAnalysis.words(col("text")).as("ws"))
    def corpusTokens(merges: Seq[(String, String)]): (Long, Double) = {
      val run = () => words.agg(sum(Bpe.bpeCount(col("ws"), merges))).head().getLong(0)
      val toks = run() // warmup
      val t = (1 to 3).map { _ =>
        val s = System.nanoTime(); run(); (System.nanoTime() - s) / 1e9
      }.min
      (toks, t)
    }
    Seq(m64.size -> m64, 512 -> mHuge.take(512), mBig.size -> mBig,
        mHuge.size -> mHuge).foreach { case (n, m) =>
      val (toks, t) = corpusTokens(m)
      println(f"bpe_count vocab=$n%6d: $toks%9d tokens in $t%5.2f s  (${toks / t / 1e6}%5.1f M tokens/s)")
    }

    // 3. kernel ≡ rank-order sweep at the large vocab, all corpus words
    val kernel = words.agg(sum(Bpe.bpeCount(col("ws"), mBig))).head().getLong(0)
    val reference = {
      val perWord = docs.select(explode(TextAnalysis.words(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("n")).collect()
      perWord.map(r => sweepCount(r.getString(0), mBig) * r.getLong(1)).sum
    }
    require(kernel == reference,
      s"kernel $kernel != rank-order sweep reference $reference at vocab ${mBig.size}")
    println(s"kernel == rank-order sweep reference at vocab ${mBig.size}: $kernel tokens")
    spark.stop()
  }
}
