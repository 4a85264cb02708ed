package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: the top-q gate MACHINERY at 5M docs, scored on a
  * pre-existing integer column (n_chars) so no text pass intrudes —
  * isolates histogram + broadcast threshold + boundary tie-break. */
object GateScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(args(0) + "/documents.parquet")
      .select("doc_id", "lang", "n_chars")
    val run = () => graft.text.TextAnalysis
      .topQualityFraction(docs, "doc_id", "lang", "n_chars", 2000).count()
    val warm = run()
    val t = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
    }.min
    println(f"gate-only at ${docs.count()} docs: kept $warm, min-of-3 $t%.3f s")
    spark.stop()
  }
}
