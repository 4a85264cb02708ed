package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: the top-q gate MACHINERY at 5M docs, scored on a
  * pre-existing integer column (n_chars) so no text pass intrudes —
  * isolates histogram + broadcast threshold + boundary tie-break.
  *
  * A second arg `degenerate` replaces the score with a CONSTANT: the
  * boundary becomes the ENTIRE corpus in one group — the worst case
  * for the tie-break, which the sliced range-rank must still handle
  * without funnelling the group through a single partition's sort
  * (the r10 hardening; pre-r10 this case was one window partition). */
object GateScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val degenerate = args.lift(1).contains("degenerate")
    val base = spark.read.parquet(args(0) + "/documents.parquet")
      .select("doc_id", "lang", "n_chars")
    val docs =
      if (degenerate)
        base.withColumn("lang", lit("g")).withColumn("n_chars", lit(7L))
      else base
    val run = () => graft.text.TextAnalysis
      .topQualityFraction(docs, "doc_id", "lang", "n_chars", 2000).count()
    val warm = run()
    val t = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
    }.min
    val mode = if (degenerate) "DEGENERATE all-one-score" else "gate-only"
    println(f"$mode at ${docs.count()} docs: kept $warm, min-of-3 $t%.3f s")
    spark.stop()
  }
}
