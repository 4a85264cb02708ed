package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-loop audit of the STREAMING loops' fixed vs marginal cost
  * (PERF.md): the bench prices d10/d17/d19/d23 at TWO micro-batches,
  * where AvailableNow scaffolding (stream start, checkpoint, drain)
  * dominates. This runner re-runs each of the four streaming dedup
  * loops at increasing batch counts over the SAME standing index and
  * fixed 50-doc batches, so the slope of total-vs-batches is the
  * per-batch marginal cost at deployment batch rates — the number that
  * says whether a batch tick is O(1) (scaffolding amortizes) or grows
  * with the corpus (it must not: every delta probe rides the index).
  *
  * `runMain graft.StreamCost [sfDir] [batchCounts...]` */
object StreamCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val counts = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(2, 10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_scost_wh_").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").select("vec_id", "embedding")
    val nDocs = docs.count()
    val nVecs = emb.count()
    val batchSize = 50L
    val maxBatches = counts.max
    // stream region = the LAST maxBatches×50 ids; the standing corpus
    // (everything before it) is identical across counts, so runs at
    // different counts probe the same index size
    val docLo = nDocs - maxBatches * batchSize
    val vecLo = nVecs - maxBatches * batchSize
    def ranges(lo: Long, c: Int): Seq[(Long, Long)] =
      (0 until c).map(i => (lo + i * batchSize, lo + (i + 1) * batchSize))

    def run(family: String, c: Int, build: () => Unit,
            stream: (String, String, String) => Unit, lo: Long, src: DataFrame,
            idCol: String): Double = {
      build()
      val chunks = SparkEntry.stageMicroBatches(src, idCol, ranges(lo, c), s"sc_$family")
      val out = java.nio.file.Files.createTempDirectory(s"graft_sc_${family}_out_").toString
      val ckpt = java.nio.file.Files.createTempDirectory(s"graft_sc_${family}_ck_").toString
      val t0 = System.nanoTime()
      stream(chunks, out, ckpt)
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[streamcost] $family%-9s batches=$c%-3d total=$s%6.2f s")
      s
    }

    def audit(family: String, lo: Long, src: DataFrame, idCol: String,
              build: () => Unit, stream: (String, String, String) => Unit): Unit = {
      val times = counts.map(c => c -> run(family, c, build, stream, lo, src, idCol))
      val (c1, t1) = times.head
      val (c2, t2) = times.last
      if (c2 != c1) {
        val marginal = (t2 - t1) / (c2 - c1)
        val fixed = t1 - marginal * c1
        println(f"[streamcost] $family%-9s marginal=$marginal%5.2f s/batch  fixed=$fixed%5.2f s")
      } // a single batch count has no slope to report
    }

    val corpusD = docs.filter(col("doc_id") < docLo)
    val corpusE = emb.filter(col("vec_id") < vecLo)

    audit("shingle", docLo, docs, "doc_id",
      () => graft.dedup.Dedup.buildShingleIndex(corpusD, "text", "doc_id", 3,
        "scost_shingle", buckets = 16),
      (chunks, out, ckpt) => graft.streaming.OnChange.streamingDedupDelta(
        spark, chunks, "text", "doc_id", 3, 0.8, "scost_shingle", out, ckpt))

    audit("substring", docLo, docs, "doc_id",
      () => graft.dedup.Dedup.buildGramIndex(corpusD, "text", "doc_id", 15, "scost_gram"),
      (chunks, out, ckpt) => graft.streaming.OnChange.streamingSubstringDedup(
        spark, chunks, "text", "doc_id", 15, "scost_gram", out, ckpt))

    audit("simhash", docLo, docs, "doc_id",
      () => graft.dedup.Dedup.buildSimhashIndex(corpusD, "text", "doc_id", 10,
        "scost_simhash", buckets = 16),
      (chunks, out, ckpt) => graft.streaming.OnChange.streamingSimhashDedup(
        spark, chunks, "text", "doc_id", 10, "scost_simhash", out, ckpt))

    audit("semantic", vecLo, emb, "vec_id",
      () => graft.ann.Ann.buildIvfIndex(corpusE, "embedding", "vec_id", "scost_sem"),
      (chunks, out, ckpt) => graft.streaming.OnChange.streamingSemanticDedup(
        spark, chunks, "embedding", "vec_id", "scost_sem", 0.9, out, ckpt))

    spark.stop()
  }
}
