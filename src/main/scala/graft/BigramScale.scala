package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** x20's scale shape measured at 1×/10×/100× (/tmp/sf100docs, the
  * StatsScale discipline — scalegen grows the VOCABULARY with the
  * corpus via generation-suffixed tokens, the adversarial case for any
  * vocabulary-keyed model). The claims under test:
  *
  *   1. the trained pair model stays BOUNDED (≤ buckets²+buckets rows
  *      however large the real vocabulary grows) — the feature-hashing
  *      guarantee that keeps every model leg broadcastable; the model
  *      row count is printed next to the distinct-token count so the
  *      gap is a number;
  *   2. train time tracks the scan/tokenize volume (one map-only pair
  *      pass + one bounded aggregate), ~linear in docs;
  *   3. score time tracks the same volume (broadcast model joins + one
  *      doc-keyed aggregate), ~linear — no leg may inflect when the
  *      vocabulary outgrows the bucket space (50k docs already exceed
  *      1024 buckets; 5M docs exceed them 500×).
  *
  * Min-of-3 after a warm run, slices staged as 32-file parquet
  * (the StatsScale discipline — the probe must not measure the
  * single-file fixture layout).
  *
  * `runMain graft.BigramScale [docsParquet] [sizes...]`
  */
object BigramScale {
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
      val basePath = java.nio.file.Files.createTempDirectory(s"graft_bigram_$n")
      try {
        all.filter(col("doc_id") < n).repartition(32)
          .write.mode("overwrite").parquet(basePath.toString)
        val base = spark.read.parquet(basePath.toString)
        def time(thunk: => Long): (Double, Long) = {
          val warm = thunk
          val t = (1 to 3).map { _ =>
            val s0 = System.nanoTime(); thunk; (System.nanoTime() - s0) / 1e9
          }.min
          (t, warm)
        }
        val en = base.filter(col("lang") === "en")
        val (tTrain, modelRows) = time(
          TextAnalysis.trainBigramModel(en, "text").count())
        // the standing model a deployment scores under (materialized
        // once, the deployment shape); training timed above is the
        // refresh marginal
        val model = TextAnalysis.trainBigramModel(en, "text").cache()
        model.count()
        // NOT .count(): the scorer ends in a left join from distinct
        // ids, which a count() lets Catalyst eliminate entirely (the
        // right side is unique-keyed, so the row count is the left
        // side's) — summing the scored column forces the whole plan
        val (tScore, scored) = time(
          TextAnalysis.bigramSurprisal(base, "text", "doc_id", model)
            .agg(sum(col("sum_bits"))).collect()(0).getLong(0))
        // x22's pay-once claim: scoring under TWO models (six broadcast
        // legs on one pair stream) must cost ~one bigramSurprisal, not
        // two — the pair pass dominates, the extra legs are bounded
        val outModel = TextAnalysis.trainBigramModel(base, "text").cache()
        outModel.count()
        val (tDiff, _) = time(
          TextAnalysis.crossEntropyDiff(base, "text", "doc_id", model, outModel)
            .agg(sum(col("diff_bits"))).collect()(0).getLong(0))
        outModel.unpersist()
        val vocab = base.withColumn("__ws", TextAnalysis.words(col("text")))
          .select(explode(col("__ws")).as("t")).distinct().count()
        model.unpersist()
        println(f"n=$n%8d  distinct_tokens=$vocab%9d  model_rows=$modelRows%8d  " +
          f"train=$tTrain%6.2f s  score=$tScore%6.2f s  xediff=$tDiff%6.2f s  corpus_bits=$scored%12d")
      } finally {
        org.apache.commons.io.FileUtils.deleteQuietly(basePath.toFile)
        ()
      }
    }
    spark.stop()
  }
}
