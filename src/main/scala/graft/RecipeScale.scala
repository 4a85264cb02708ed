package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.jobs.Recipe
import graft.text.Bpe

/** p12's 100 TB claim, proven the p10/x11 way (PERF.md): a FIXED
  * 5000-doc batch processed against standing corpora of 50k / 500k /
  * 5M docs (1× / 10× / 100×, /tmp/sf100docs) — the per-batch marginal
  * must stay flat-ish in standing-corpus size, because every stage is
  * batch-linear: the gram probes ride the index buckets (only the
  * batch's gram postings are read), the model is a broadcast head,
  * and the single standing-corpus-sized term is the declared ledger
  * aggregate (one per-group sum). Standing state builds are untimed
  * (the once-per-snapshot deployment cost); the probe never absorbs,
  * so it is repeatable min-of-3.
  *
  * `runMain graft.RecipeScale [docsParquet] [sizes...]`
  */
object RecipeScale {
  def main(args: Array[String]): Unit = {
    val docsPath = args.headOption.getOrElse("/tmp/sf100docs/documents.parquet")
    val sizes = if (args.length > 1) args.drop(1).map(_.toLong).toSeq
                else Seq(50000L, 500000L, 5000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val all = spark.read.parquet(docsPath)
    val maxId = all.agg(max("doc_id")).head().getLong(0)
    // the SAME batch rows at every standing size
    val batch = all.filter(col("doc_id") > maxId - 5000)
    sizes.foreach { n =>
      val standing = all.filter(col("doc_id") < n)
        .withColumn("label", col("doc_id") % 4 =!= 1)
      // eval set: a fixed 5k slice outside both standing and batch id
      // ranges at every size (ids just below the batch window)
      val eval = all.filter(
        col("doc_id") > maxId - 10000 && col("doc_id") <= maxId - 5000)
      val t0 = System.nanoTime()
      val st = Recipe.buildStanding(spark, standing, eval, "text", "doc_id",
        "lang", "label", k = 15, Bpe.DefaultMerges, prefix = s"rsc_$n",
        buckets = 32)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val run = () => Recipe.processBatch(spark, st, batch, "text", "doc_id",
        "lang", Map("en" -> 30000L), k = 15, Bpe.DefaultMerges)
        .emission.count()
      val warm = run()
      val t = (1 to 3).map { _ =>
        val s0 = System.nanoTime(); run(); (System.nanoTime() - s0) / 1e9
      }.min
      println(f"standing=$n%8d docs  build(untimed)=$tBuild%7.1f s  " +
        f"batch=5000  emission=$warm%7d  marginal min-of-3 = $t%.2f s")
    }
    spark.stop()
  }
}
