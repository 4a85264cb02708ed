package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** x16/x17's scale shape measured at 1×/10×/100× (/tmp/sf100docs, the
  * SplitScale discipline). The headline column is the SKETCH path
  * (`ngramKmvSketch`, the KmvMinima bounded aggregate): its one
  * exchange carries ≤ tasks·k longs per group, so it must stay ~flat
  * in the VOCABULARY and track only the scan/tokenize volume. Next to
  * it, the exact distinct (the verification leg, and r13's whole-query
  * shape) pays the vocabulary-sized Exchange — scalegen grows the
  * vocabulary with the corpus here (generation-suffixed tokens), the
  * adversarial case where that shuffle spills and goes superlinear.
  * The gap between the two columns IS the sketch's value proposition.
  * x17's one corpus-sized map-side-combined (group, token) count is
  * measured alongside. Min-of-3 after a warm run, on the raw parquet
  * (the scan IS part of the measured shape — one-pass statistics, no
  * standing state to pin).
  *
  * `runMain graft.StatsScale [docsParquet] [sizes...]`
  */
object StatsScale {
  def main(args: Array[String]): Unit = {
    val docsPath = args.headOption.getOrElse("/tmp/sf100docs/documents.parquet")
    val sizes = if (args.length > 1) args.drop(1).map(_.toLong).toSeq
                else Seq(50000L, 500000L, 5000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val all = spark.read.parquet(docsPath).select(col("doc_id"), col("lang"), col("text"))
    sizes.foreach { n =>
      // stage the slice as a 32-file parquet (untimed): the fixture is
      // ONE 600 MB file, so reading it directly caps the scan at ~5
      // input partitions and the probe would measure the fixture's
      // file layout, not the operator (a real corpus is many files)
      val basePath = java.nio.file.Files.createTempDirectory(s"graft_stats_$n")
      try {
        all.filter(col("doc_id") < n).repartition(32)
          .write.mode("overwrite").parquet(basePath.toString)
        val base = spark.read.parquet(basePath.toString)
        def time(df: => org.apache.spark.sql.DataFrame): (Double, Long) = {
          val warm = df.count()
          val t = (1 to 3).map { _ =>
            val s0 = System.nanoTime(); df.count(); (System.nanoTime() - s0) / 1e9
          }.min
          (t, warm)
        }
        val (tSketch, _) = time(TextAnalysis.ngramKmvSketch(base, "text", "lang"))
        val (tStats, _) = time(TextAnalysis.tokenFrequencyStats(base, "text", "lang"))
        // the exact-distinct leg: the vocabulary-sized Exchange the
        // sketch avoids, and the vocabulary size for context
        val t0 = System.nanoTime()
        val vocab = base.withColumn("__ws", TextAnalysis.words(col("text")))
          .select(explode(TextAnalysis.ngrams(col("__ws"), 3)).as("g")).distinct().count()
        val tExact = (System.nanoTime() - t0) / 1e9
        println(f"n=$n%8d  distinct3grams=$vocab%9d  sketch=$tSketch%6.2f s  " +
          f"exactdistinct=$tExact%6.2f s  tokenstats=$tStats%6.2f s")
      } finally {
        // the 5M-doc slice is multi-GB — never leave three copies in /tmp
        org.apache.commons.io.FileUtils.deleteQuietly(basePath.toFile)
        ()
      }
    }
    spark.stop()
  }
}
