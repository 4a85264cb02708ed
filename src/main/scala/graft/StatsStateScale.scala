package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.StatsState

/** The standing-stats ABSORB marginal measured against a growing
  * standing corpus (the SplitScale/PackScale discipline): build the
  * state on n docs (untimed — the once-per-snapshot cost), then time
  * ONE `absorbIntoStatsState` of a FIXED 5000-doc batch of new ids,
  * and the post-absorb read-outs. The claim under test is x18's
  * 100 TB story: the absorb is O(batch) — batch tokenize + a
  * roster-probe semi-join (doc-count-sized) + appends — so its cost
  * must stay ~FLAT as the standing corpus grows 100×, while the
  * read-out grows only with the vocabulary-sized log, never the
  * corpus. A single timed pass per size: absorb mutates state, so a
  * min-of-3 would be three different operations (the reason the
  * SteadyState probe prices only the read-out).
  *
  * `runMain graft.StatsStateScale [docsParquet] [sizes...]` */
object StatsStateScale {
  def main(args: Array[String]): Unit = {
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
    sizes.foreach { n =>
      val staged = java.nio.file.Files.createTempDirectory(s"graft_sss_$n")
      try {
        all.filter(col("doc_id") < n + batchN).repartition(32)
          .write.mode("overwrite").parquet(staged.toString)
        val base = spark.read.parquet(staged.toString)
        StatsState.buildStatsState(base.filter(col("doc_id") < n),
          "text", "lang", "doc_id", "sss_state")
        val batch = base.filter(col("doc_id") >= n) // fixed-size, new ids
        val t0 = System.nanoTime()
        StatsState.absorbIntoStatsState(spark, batch, "text", "lang", "doc_id",
          "sss_state", batchId = 1L)
        val tAbsorb = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val rows = StatsState.tokenStatsReadout(spark, "sss_state")
          .join(StatsState.kmvReadout(spark, "sss_state"), Seq("group")).count()
        val tRead = (System.nanoTime() - t1) / 1e9
        println(f"n=$n%8d  batch=$batchN  absorb=$tAbsorb%6.2f s  readout=$tRead%6.2f s  groups=$rows")
      } finally {
        org.apache.commons.io.FileUtils.deleteQuietly(staged.toFile)
        ()
      }
    }
    spark.stop()
  }
}
