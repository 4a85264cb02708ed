package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** x16/x17's scale shape measured at 1×/10×/100× (/tmp/sf100docs, the
  * SplitScale discipline): both operators pay ONE corpus-sized pass
  * (x16: the distinct (group, hash) shuffle; x17: the map-side-
  * combined (group, token) count) and everything after is bounded by
  * the VOCABULARY — which scalegen grows with the corpus here
  * (generation-suffixed tokens), making this the adversarial case:
  * the vocabulary is ~corpus-sized-distinct, and the two-phase top-k
  * must still never sort a group's vocabulary on one task. Growth
  * should track the scan/shuffle volume (linear-ish), never a
  * super-linear sort term. Min-of-3 after a warm run, on the raw
  * parquet (the scan IS part of the measured shape here — these are
  * one-pass statistics, there is no standing state to pin).
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
      val baseDir = java.nio.file.Files.createTempDirectory(s"graft_stats_$n").toString
      all.filter(col("doc_id") < n).repartition(32).write.mode("overwrite").parquet(baseDir)
      val base = spark.read.parquet(baseDir)
      def time(df: => org.apache.spark.sql.DataFrame): (Double, Long) = {
        val warm = df.count()
        val t = (1 to 3).map { _ =>
          val s0 = System.nanoTime(); df.count(); (System.nanoTime() - s0) / 1e9
        }.min
        (t, warm)
      }
      val (tKmv, _) = time(TextAnalysis.ngramKmv(base, "text", "lang"))
      val (tStats, _) = time(TextAnalysis.tokenFrequencyStats(base, "text", "lang"))
      // the vocabulary the one corpus pass reduces to (context for the
      // "everything after is vocab-bounded" claim)
      val vocab = base.withColumn("__ws", TextAnalysis.words(col("text")))
        .select(explode(TextAnalysis.ngrams(col("__ws"), 3)).as("g")).distinct().count()
      println(f"n=$n%8d  distinct3grams=$vocab%9d  kmv=$tKmv%6.2f s  tokenstats=$tStats%6.2f s")
    }
    spark.stop()
  }
}
