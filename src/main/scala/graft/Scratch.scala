package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// dev scratchpad — NOT part of the library; deleted before round close
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    if (args.length > 1 && args(1) == "shm") {
      val d = "/dev/shm/graft_scr_" + ProcessHandle.current().pid()
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
      System.setProperty("java.io.tmpdir", d)
      println(s"[scratch] tmpdir=$d")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", System.getProperty("java.io.tmpdir"))
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_scr_wh_").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    // warmups
    graft.streaming.OnChange.windowedStream(spark, s"$sfDir/events.parquet").count()
    time("e3 windowedStream") {
      graft.streaming.OnChange.windowedStream(spark, s"$sfDir/events.parquet").count()
    }
    time("e3 windowedStream pass2") {
      graft.streaming.OnChange.windowedStream(spark, s"$sfDir/events.parquet").count()
    }
    // d10-shaped drain (shingle loop, two staged micro-batches)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def d10(label: String): Unit = time(label) {
      val table = graft.core.Tables.scoped("scr_shingle")
      graft.dedup.Dedup.buildShingleIndex(
        docs.filter(col("doc_id") < 400 || col("doc_id") >= 600),
        "text", "doc_id", 3, table, buckets = 16)
      val chunks = SparkEntry.stageMicroBatches(docs, "doc_id",
        Seq((400L, 500L), (500L, 600L)), "scrd10")
      val pairs = java.nio.file.Files.createTempDirectory("graft_scr_pairs_").toString
      val ckpt = java.nio.file.Files.createTempDirectory("graft_scr_ckpt_").toString
      graft.streaming.OnChange.streamingDedupDelta(spark, chunks, "text", "doc_id",
        3, 0.8, table, pairs, ckpt)
      spark.read.parquet(pairs).count()
    }
    d10("d10 drain (warm1)")
    d10("d10 drain pass2")
    // x18-shaped standing stats chain
    def x18(label: String): Unit = time(label) {
      val tbl = graft.core.Tables.scoped("scr_x18")
      graft.text.StatsState.buildStatsState(docs.filter(col("doc_id") % 2 === 0),
        "text", "lang", "doc_id", tbl)
      val odd = docs.filter(col("doc_id") % 2 === 1)
      graft.text.StatsState.absorbIntoStatsState(spark, odd, "text", "lang", "doc_id", tbl, 1L)
      graft.text.StatsState.absorbIntoStatsState(spark, odd, "text", "lang", "doc_id", tbl, 1L)
      graft.text.StatsState.absorbIntoStatsState(spark,
        docs.filter(col("doc_id") % 10 === 0)
          .withColumn("text", concat(col("text"), lit(" graftxa graftxb graftxa"))),
        "text", "lang", "doc_id", tbl, 2L)
      graft.text.StatsState.compactStatsState(spark, tbl)
      graft.text.StatsState.tokenStatsReadout(spark, tbl)
        .join(graft.text.StatsState.kmvReadout(spark, tbl), Seq("group")).count()
    }
    x18("x18 chain (warm1)")
    x18("x18 chain pass2")
    spark.stop()
  }
}
