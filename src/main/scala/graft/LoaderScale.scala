package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** p26/x21's scale shape measured at 1×/10×/100× (/tmp/sf100docs, the
  * StatsScale discipline). The claims under test:
  *
  *   - p26 `lengthBucketBatches`: the rank window partitions on
  *     (bucket, shard) — every sort bounded by shardSize docs — and
  *     the per-batch aggregate rides the same shuffle (plan-pinned in
  *     spec); wall time must track the scan volume, ~linear, with no
  *     inflection as the bucket population grows 100×.
  *   - x21 `chunkWindows`: map-only (zero exchanges, plan-pinned);
  *     wall time IS the scan + explode volume, ~linear.
  *
  * Both timed via an aggregate over an output column (never a bare
  * count() — the BigramScale lesson: Catalyst elides unique-keyed
  * joins and whole map stages under count() when row counts are
  * derivable). Min-of-3 after a warm run, slices staged as 32-file
  * parquet.
  *
  * `runMain graft.LoaderScale [docsParquet] [sizes...]`
  */
object LoaderScale {
  def main(args: Array[String]): Unit = {
    val docsPath = args.headOption.getOrElse("/tmp/sf100docs/documents.parquet")
    val sizes = if (args.length > 1) args.drop(1).map(_.toLong).toSeq
                else Seq(50000L, 500000L, 5000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val all = spark.read.parquet(docsPath).select(col("doc_id"), col("text"))
    sizes.foreach { n =>
      val basePath = java.nio.file.Files.createTempDirectory(s"graft_loader_$n")
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
        val lens = base.select(col("doc_id"),
          size(TextAnalysis.words(col("text"))).cast("long").as("n_tok"))
        val (tBatch, batches) = time {
          val b = TextAnalysis.lengthBucketBatches(lens, "doc_id", "n_tok",
            bucketWidth = 16L, batchSize = 8L, shardSize = 100000L)
          b.agg(count(lit(1)), sum(col("padded_tokens"))).collect()(0).getLong(0)
        }
        val (tChunk, chunks) = time {
          TextAnalysis.chunkWindows(base, "text", "doc_id", window = 64, stride = 48)
            .agg(count(lit(1)), sum(col("n_tok"))).collect()(0).getLong(0)
        }
        println(f"n=$n%8d  batches=$batches%9d  p26=$tBatch%6.2f s  " +
          f"chunks=$chunks%9d  x21=$tChunk%6.2f s")
      } finally {
        org.apache.commons.io.FileUtils.deleteQuietly(basePath.toFile)
        ()
      }
    }
    spark.stop()
  }
}
