package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** p19's 100 TB claim, proven the RecipeScale way (PERF.md): the
  * exact-count holdout split at 50k / 500k / 5M docs (1× / 10× /
  * 100×, /tmp/sf100docs) against the NAIVE shape it replaces — a
  * per-group `row_number() OVER (ORDER BY u, id)` window, which
  * funnels each group through ONE task's sort regardless of cluster
  * size (the corpus has a handful of languages, so at 5M docs the
  * window is a few ~1M-row single-task sorts on a 32-way box and
  * only gets worse with cores). The histogram split's heavy path is
  * two map-only passes (a map-side-combined (group, bucket) count +
  * a broadcast-filter emit) and a boundary rank bounded by n/2^bits
  * docs — its advantage must GROW with corpus size.
  *
  * Both paths run over the SAME pinned (doc_id, lang) base (text
  * parsing untimed — the operator is the subject), min-of-3 after a
  * warm run, and their holdout SETS are asserted identical (the
  * equality is also spec-pinned, set-exact, in TextMultimodalSpec).
  *
  * `runMain graft.SplitScale [docsParquet] [sizes...]`
  */
object SplitScale {
  def main(args: Array[String]): Unit = {
    val docsPath = args.headOption.getOrElse("/tmp/sf100docs/documents.parquet")
    val sizes = if (args.length > 1) args.drop(1).map(_.toLong).toSeq
                else Seq(50000L, 500000L, 5000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val all = spark.read.parquet(docsPath).select(col("doc_id"), col("lang"))
    sizes.foreach { n =>
      val base = graft.core.Checkpoints.truncate(all.filter(col("doc_id") < n))
      def run(df: => DataFrame): (Double, Long) = {
        def once(): Long = df.filter(col("split") === "holdout").count()
        val warm = once()
        val t = (1 to 3).map { _ =>
          val s0 = System.nanoTime(); once(); (System.nanoTime() - s0) / 1e9
        }.min
        (t, warm)
      }
      val (tHist, kHist) = run(
        TextAnalysis.holdoutSplit(base, "doc_id", "lang", holdBp = 1000))
      val (tNaive, kNaive) = run {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("lang")
          .orderBy(TextAnalysis.sampleHash(col("doc_id"), "split"), col("doc_id"))
        base.filter(col("lang").isNotNull)
          .withColumn("__rn", row_number().over(w))
          .withColumn("__n", count(lit(1)).over(Window.partitionBy("lang")))
          .withColumn("split",
            when(col("__rn") <= expr("(__n * 1000 + 9999) div 10000"), lit("holdout"))
              .otherwise(lit("train")))
      }
      require(kHist == kNaive, s"holdout counts diverged: $kHist vs $kNaive")
      println(f"n=$n%8d  holdout=$kHist%7d  histogram=$tHist%6.2f s  naive-window=$tNaive%6.2f s  speedup=${tNaive / tHist}%4.1fx")
    }
    spark.stop()
  }
}
