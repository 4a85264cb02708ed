package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-loop scale proof for the incremental dedup path (PERF.md):
  * grow the standing corpus 1×/10×/100× at a FIXED ingest batch size
  * and time (a) the d8 delta probe and (b) a d10-style streaming tick
  * (delta + absorb). Replica texts get per-replica word prefixes, so
  * replica shingles are disjoint — the corpus grows without inflating
  * any posting list, isolating pure corpus-size effects.
  *
  * `runMain graft.DedupScale [sfDir] [multipliers...]` */
object DedupScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mults = (if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 10, 100))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_scale_wh_").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val n = docs.count()
    // the fixed batch: 100 docs re-keyed to fresh ids; texts match
    // replica 0, so every batch doc has exactly one true near-dup in
    // the corpus at every multiplier
    val batch = docs.filter(col("doc_id") < 100)
      .select((col("doc_id") + 9000000000000000L).as("doc_id"), col("text"))
    mults.foreach { x =>
      val corpus = (0 until x).map { k =>
        if (k == 0) docs
        else docs.select((col("doc_id") + k * 1000000L).as("doc_id"),
          regexp_replace(col("text"), " ", s" z$k").as("text"))
      }.reduce(_ unionByName _)
      val table = s"scaleproof_idx_$x"
      var t0 = System.nanoTime()
      graft.dedup.Dedup.buildShingleIndex(corpus, "text", "doc_id", 3, table)
      val buildS = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val pairs = graft.dedup.Dedup
        .ngramJaccardDelta(spark, batch, "text", "doc_id", 3, 0.8, table).count()
      val deltaS = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      graft.dedup.Dedup.absorbIntoShingleIndex(spark, batch, "text", "doc_id", 3, table)
      val absorbS = (System.nanoTime() - t0) / 1e9
      println(f"[scale] x$x%-3d corpus=${n * x}%8d docs  build=$buildS%7.1f s  " +
        f"delta=$deltaS%6.2f s  absorb=$absorbS%6.2f s  pairs=$pairs")
    }
    spark.stop()
  }
}
