package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.StatsState

/** The standing-stats ABSORB marginal measured against a growing
  * standing corpus (the SplitScale/PackScale discipline): build the
  * state on n docs (untimed — the once-per-snapshot cost), then time
  * ONE `absorbIntoStatsState` each of
  *
  *  - a FIXED 5000-doc batch of NEW ids (the append-style ingest fast
  *    path: batch tokenize + roster probe + appends);
  *  - a FIXED 5000-doc OVERLAPPING batch of CONTIGUOUS standing ids,
  *    re-ingested with appended text (the change-log re-ingest
  *    regime): the supersede negation leg must read ONLY the batch's
  *    touched shard partitions — O(touched shards · shardSize), so
  *    this row must stay ~FLAT as the standing corpus grows 100×;
  *  - a FIXED 5000-doc overlapping batch of ids SPREAD uniformly
  *    across the corpus — the documented worst case: the batch
  *    touches ~every shard, so the negation leg degrades to
  *    min(batch, shards)·shardSize docs' contributions read, which
  *    GROWS with the corpus until every shard is touched. Measured
  *    deliberately so the bound is a number, not prose;
  *
  * and the post-absorb read-outs (vocabulary-sized, never a corpus
  * pass). A single timed pass per size: absorb mutates state, so a
  * min-of-3 would be three different operations (the reason the
  * SteadyState probe prices only the read-out).
  *
  * `runMain graft.StatsStateScale [docsParquet] [sizes...]`
  *
  * CURVE mode (`runMain graft.StatsStateScale curve [docsParquet] [n]
  * [shardSizes...]`): the READ-OUT cost vs the shard-count layout knob
  * at a FIXED corpus — r15 measured the 10k-vs-100k shardSize cliff at
  * one point; this sweeps partitions (e.g. 50/500/5000 at 500k docs),
  * counts physical files before/after `compactStatsState`, and times
  * the read-out in both states — so the layout knob has a measured
  * curve AND the compact valve's effect is a number. */
object StatsStateScale {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("curve")) return curve(args.drop(1))
    val docsPath = args.headOption.getOrElse("/tmp/sf100docs/documents.parquet")
    val sizes = if (args.length > 1) args.drop(1).map(_.toLong).toSeq
                else Seq(50000L, 500000L, 5000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_sss_wh_").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val all = spark.read.parquet(docsPath).select(col("doc_id"), col("lang"), col("text"))
    val batchN = 5000L
    // shardSize trades supersede granularity against file count: a
    // deployment sizes it so the partition count stays filesystem-
    // friendly (the PackIndex guidance). 100k docs/shard = 50
    // partitions at the 5M fixture; the supersede bound is
    // O(touched shards · shardSize) either way — corpus-independent.
    // (A 10k-shard first cut put 500 partitions × 32 bucket files ×
    // per-absorb appends on disk and the read-out paid 24× in file
    // opens/listing: 154 s vs 6.4 s at 5M — layout matters as much as
    // pruning; see PERF.md round-15.)
    val shardSize = 100000L
    sizes.foreach { n =>
      val staged = java.nio.file.Files.createTempDirectory(s"graft_sss_$n")
      try {
        all.filter(col("doc_id") < n + batchN).repartition(32)
          .write.mode("overwrite").parquet(staged.toString)
        val base = spark.read.parquet(staged.toString)
        StatsState.buildStatsState(base.filter(col("doc_id") < n),
          "text", "lang", "doc_id", "sss_state", shardSize = shardSize)
        val batch = base.filter(col("doc_id") >= n) // fixed-size, new ids
        val t0 = System.nanoTime()
        StatsState.absorbIntoStatsState(spark, batch, "text", "lang", "doc_id",
          "sss_state", batchId = 1L)
        val tAbsorb = (System.nanoTime() - t0) / 1e9
        // contiguous overlap: re-ingest standing ids [0, batchN) with
        // appended text — one touched shard, the prunable regime
        val contig = base.filter(col("doc_id") < batchN)
          .withColumn("text", concat(col("text"), lit(" graftre graftre2")))
        val t1 = System.nanoTime()
        StatsState.absorbIntoStatsState(spark, contig, "text", "lang", "doc_id",
          "sss_state", batchId = 2L)
        val tContig = (System.nanoTime() - t1) / 1e9
        // spread overlap: ids ≡ 0 (mod n/batchN) — touches ~every shard
        val step = math.max(1L, n / batchN)
        val spread = base.filter(col("doc_id") < n && col("doc_id") % step === 0L)
          .withColumn("text", concat(col("text"), lit(" graftsp")))
        val t2 = System.nanoTime()
        StatsState.absorbIntoStatsState(spark, spread, "text", "lang", "doc_id",
          "sss_state", batchId = 3L)
        val tSpread = (System.nanoTime() - t2) / 1e9
        val t3 = System.nanoTime()
        val rows = StatsState.tokenStatsReadout(spark, "sss_state")
          .join(StatsState.kmvReadout(spark, "sss_state"), Seq("group")).count()
        val tRead = (System.nanoTime() - t3) / 1e9
        println(f"n=$n%8d  batch=$batchN  absorb_new=$tAbsorb%6.2f s  " +
          f"absorb_overlap_contig=$tContig%6.2f s  absorb_overlap_spread=$tSpread%6.2f s  " +
          f"readout=$tRead%6.2f s  groups=$rows")
      } finally {
        org.apache.commons.io.FileUtils.deleteQuietly(staged.toFile)
        ()
      }
    }
    spark.stop()
  }

  /** Read-out vs shard count at fixed corpus (see the object doc). */
  private def curve(args: Array[String]): Unit = {
    val docsPath = args.headOption.getOrElse("/tmp/sf10docs/documents.parquet")
    val n = if (args.length > 1) args(1).toLong else 500000L
    val shardSizes = if (args.length > 2) args.drop(2).map(_.toLong).toSeq
                     else Seq(10000L, 1000L, 100L) // 50 / 500 / 5000 partitions at 500k
    val wh = java.nio.file.Files.createTempDirectory("graft_sssc_wh_").toString
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", wh)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val batchN = 5000L
    val all = spark.read.parquet(docsPath)
      .select(col("doc_id"), col("lang"), col("text"))
      .filter(col("doc_id") < n + 3 * batchN)
    all.persist()
    def freqFiles(table: String): Long = {
      val root = new java.io.File(new java.net.URI(wh).getPath, s"${table}_freq")
      root.listFiles().filter(_.isDirectory)
        .map(_.listFiles().count(f => f.isFile && !f.getName.startsWith("."))).sum.toLong
    }
    def timeReadout(table: String): Double = {
      // min-of-2: the read-out is pure, unlike the absorb rows above
      (0 until 2).map { _ =>
        val t = System.nanoTime()
        StatsState.tokenStatsReadout(spark, table).count()
        (System.nanoTime() - t) / 1e9
      }.min
    }
    shardSizes.foreach { ss =>
      val table = s"sss_curve_$ss"
      StatsState.buildStatsState(all.filter(col("doc_id") < n),
        "text", "lang", "doc_id", table, shardSize = ss)
      // three absorb cadences — each appends a file per touched
      // (partition × bucket); the read-out then prices the LAYOUT
      (0 until 3).foreach { i =>
        val lo = n + i * batchN
        StatsState.absorbIntoStatsState(spark,
          all.filter(col("doc_id") >= lo && col("doc_id") < lo + batchN),
          "text", "lang", "doc_id", table, batchId = i + 1L)
      }
      val partitions = (n + ss - 1) / ss
      val filesBefore = freqFiles(table)
      val readBefore = timeReadout(table)
      StatsState.compactStatsState(spark, table)
      val filesAfter = freqFiles(table)
      val readAfter = timeReadout(table)
      println(f"n=$n%8d  shardSize=$ss%7d  partitions=$partitions%5d  " +
        f"files_before=$filesBefore%6d  readout_before=$readBefore%6.2f s  " +
        f"files_after=$filesAfter%6d  readout_after=$readAfter%6.2f s")
    }
    spark.stop()
  }
}
