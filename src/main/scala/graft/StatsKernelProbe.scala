package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Component-cost breakdown of the KMV sketch leg — where does the
  * corpus pass actually spend its time? (scan → regex tokenize →
  * n-gram string assembly → md5 head → bounded aggregate). Run against
  * a scalegen fixture slice; each stage adds one component so the
  * deltas attribute cost honestly. The answer drives optimization
  * priority: if tokenize dominates, a faster hash kernel cannot move
  * the total (the r14 Md5Head32 lesson — 6% where the hex round-trip
  * was expected to be a third).
  *
  * `runMain graft.StatsKernelProbe [docsParquet] [nDocs]` */
object StatsKernelProbe {
  def main(args: Array[String]): Unit = {
    val docsPath = args.headOption.getOrElse("/tmp/sf100docs/documents.parquet")
    val n = if (args.length > 1) args(1).toLong else 500000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val staged = java.nio.file.Files.createTempDirectory(s"graft_kprobe_$n")
    try {
      spark.read.parquet(docsPath).select(col("doc_id"), col("lang"), col("text"))
        .filter(col("doc_id") < n).repartition(32)
        .write.mode("overwrite").parquet(staged.toString)
      val base = spark.read.parquet(staged.toString)
      def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
        df.count()
        val t = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
        }.min
        println(f"[kprobe] $name%-26s $t%6.2f s")
      }
      val ws = base.withColumn("__ws", TextAnalysis.words(col("text")))
      time("scan")(base)
      time("tokenize+explode")(ws.select(col("lang"), explode(col("__ws")).as("w")))
      time("ngram-strings")(ws.select(col("lang"),
        explode(TextAnalysis.ngrams(col("__ws"), 3)).as("t")))
      time("+md5head32")(ws.select(col("lang"),
        explode(TextAnalysis.ngrams(col("__ws"), 3)).as("t"))
        .select(col("lang"), graft.functions.VectorFunctions.md5Head32(col("t")).as("h")))
      time("full-sketch")(TextAnalysis.ngramKmvSketch(base, "text", "lang"))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(staged.toFile)
      ()
    }
    spark.stop()
  }
}
