package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-loop scale proof for the incremental substring-dedup path
  * (PERF.md): grow the standing corpus 1×/10×/100× at a FIXED ingest
  * batch size and time (a) the gram-index build, (b) the d18 delta
  * probe, (c) the absorb tick. Replica texts get per-replica word
  * prefixes, so replica grams are disjoint — the corpus grows without
  * inflating any posting list, isolating pure corpus-size effects.
  * Batch texts match replica 0, so every batch doc is fully duplicated
  * against the corpus at every multiplier (spans = whole docs, count
  * constant — the recall certificate).
  *
  * `runMain graft.SubstringScale [sfDir] [multipliers...]` */
object SubstringScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mults = (if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 10, 100))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_sscale_wh_").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val n = docs.count()
    val batch = docs.filter(col("doc_id") < 100)
      .select((col("doc_id") + 9000000000000000L).as("doc_id"), col("text"))
    mults.foreach { x =>
      val corpus = (0 until x).map { k =>
        if (k == 0) docs
        else docs.select((col("doc_id") + k * 1000000L).as("doc_id"),
          regexp_replace(col("text"), " ", s" z$k").as("text"))
      }.reduce(_ unionByName _)
      val table = s"sscaleproof_idx_$x"
      var t0 = System.nanoTime()
      graft.dedup.Dedup.buildGramIndex(corpus, "text", "doc_id", 15, table)
      val buildS = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val spans = graft.dedup.Dedup
        .substringSpansDelta(spark, batch, "text", "doc_id", 15, table).count()
      val deltaS = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      graft.dedup.Dedup.absorbIntoGramIndex(spark, batch, "text", "doc_id", 15, table)
      val absorbS = (System.nanoTime() - t0) / 1e9
      println(f"[scale] x$x%-3d corpus=${n * x}%8d docs  build=$buildS%7.1f s  " +
        f"delta=$deltaS%6.2f s  absorb=$absorbS%6.2f s  spans=$spans")
    }
    spark.stop()
  }
}
