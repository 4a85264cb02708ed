package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.jobs.{DatasetRegistry, Recipe}
import graft.text.TextAnalysis

/** The chain's glue link (`Recipe.emissionRollupJob`, p18) measured
  * the RecipeScale/PackScale way: a FIXED 5000-doc re-ingest window
  * rolled up against standing emission/token-log state built from
  * 50k / 500k / 5M docs (1× / 10× / 100×, /tmp/sf100docs).
  *
  * A rollup firing is LAZY — the upsert sink publishes a plan layer
  * into the registry, and the work is paid when that layer
  * materializes (the sink's node-budget pin, or a downstream read).
  * So one number would lie; the probe times the three costs a
  * deployment actually pays, each min-of-3 on a PINNED base (the
  * state is a fixed point on the fixed window):
  *
  *  1. fire — token mechanics + plan append + analysis, pure driver
  *     work: must be FLAT in standing size.
  *  2. layer materialization — a full pass of the new layer over the
  *     pinned base (truncate = what the node-budget pin pays,
  *     amortized over ~budget/layer firings; also the worst-case
  *     downstream read). Grows with standing size by construction —
  *     but SCAN/checkpoint-write shaped (the emission semi-join probe
  *     and the upsert anti-join are column-pruned scans; the only
  *     SHUFFLE is window-sized, the claim under test). The growth
  *     factor vs corpus factor is the verdict.
  *  3. packer-shaped windowed read — `latestOnly(toklog where
  *     recorded > token)`, what the chain's next link materializes
  *     daily: the filter pushes through the upsert legs, so this must
  *     be near-flat despite the standing-sized lineage.
  *
  * The raw log leg is free by construction: standing rows carry a
  * literal `recorded = 0`, so the window filter constant-folds the
  * standing leg of the union away — only the window's rows are read.
  *
  * `runMain graft.ChainScale [docsParquet] [sizes...]`
  */
object ChainScale {
  def main(args: Array[String]): Unit = {
    val docsPath = args.headOption.getOrElse("/tmp/sf100docs/documents.parquet")
    val sizes = if (args.length > 1) args.drop(1).map(_.toLong).toSeq
                else Seq(50000L, 500000L, 5000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val all = spark.read.parquet(docsPath)
      .select(col("doc_id"), col("lang"), TextAnalysis.wsTokens(col("text")).as("tok"))
    // the SAME window rows at every standing size: re-ingested
    // revisions of 5000 ids from the first 50k docs (present at 1×)
    val window = all.filter(col("doc_id") < 50000L && col("doc_id") % 10 === 0)

    sizes.foreach { n =>
      val docs = all.filter(col("doc_id") < n)
      val em = s"csc_emission_$n"
      val tl = s"csc_toklog_$n"
      graft.core.Tables.drop(spark, em)
      graft.core.Tables.drop(spark, tl)
      val t0 = System.nanoTime()
      // standing emission: the mixture's per-copy rows (2 copies/doc)
      docs.select(col("doc_id"), col("lang"), col("tok").as("bpe_tokens"), lit(0L).as("copy"))
        .unionByName(docs.select(col("doc_id"), col("lang"),
          col("tok").as("bpe_tokens"), lit(1L).as("copy")))
        .write.mode("overwrite").saveAsTable(em)
      // standing token log: one row per doc
      docs.select(col("doc_id"), col("lang"), (col("tok") * 2).as("emitted_tokens"),
          lit(0L).as("recorded"))
        .write.mode("overwrite").saveAsTable(tl)
      val tBuild = (System.nanoTime() - t0) / 1e9
      println(f"standing=$n%8d docs (emission=${2 * n}%9d rows)  build(untimed)=$tBuild%6.1f s")

      val reg = new DatasetRegistry
      reg.put("rawlog", docs.select(col("doc_id"), col("lang"))
        .withColumn("recorded", lit(0L))
        .unionByName(window.select(col("doc_id"), col("lang"))
          .withColumn("recorded", lit(1L))))
      reg.put("emission", spark.table(em))
      reg.put("toklog", spark.table(tl))
      val cj = Recipe.emissionRollupJob(reg, "rawlog", "emission", "toklog",
        "doc_id", "lang", "recorded")
      def fire(): Unit = cj.makeJob(Some(0L)).run(spark, Some(reg))
      fire() // warm (also JIT/broadcast warmup)
      val base = graft.core.Checkpoints.truncate(reg.get("toklog"))
      def minOf3(body: () => Unit): Double = (1 to 3).map { _ =>
        reg.put("toklog", base)
        val s0 = System.nanoTime(); body(); (System.nanoTime() - s0) / 1e9
      }.min
      val tFire = minOf3(() => fire())
      val tLayer = minOf3 { () =>
        fire()
        graft.core.Checkpoints.truncate(reg.get("toklog"))
      }
      val tRead = minOf3 { () =>
        fire()
        graft.ops.ChangeLog.latestOnly(
            reg.get("toklog").filter(col("recorded") > 0), "doc_id", "recorded")
          .agg(count(lit(1)), sum(col("emitted_tokens"))).collect()
      }
      println(f"  fire(plan+token)=$tFire%5.2f s   fire+pin(full layer)=$tLayer%5.2f s" +
        f"   fire+packer-window read=$tRead%5.2f s   (window=5000)")
    }
    spark.stop()
  }
}
