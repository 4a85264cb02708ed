package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-loop scale proof for the Bloom decontamination prefilter
  * (PERF.md): d24's regime is TRAIN = the enormous corpus (the side
  * whose gram shuffle dominates), EVAL = too big to broadcast exactly
  * but far smaller than train (simulated by disabling broadcast). Grow
  * the train side by replica multipliers (disjoint vocabularies, so
  * true overlap stays exactly replica 0's and results must be constant)
  * and compare the exact vs Bloom paths on wall time and — the at-scale
  * signal a single box otherwise hides — total SHUFFLE BYTES.
  *
  * `runMain graft.BloomScale [sfDir] [multipliers...]` */
object BloomScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mults = (if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 4, 16))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_bloom_wh_").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    // eval: fixed 2k docs; base train: the other ~3k, grown by replica
    // multipliers with per-replica token suffixes (disjoint grams) —
    // the train gram stream grows linearly while the true-overlap span
    // set stays exactly replica 0's, so results must be constant.
    val eval = docs.filter(col("doc_id") < 2000)
    val train0 = docs.filter(col("doc_id") >= 2000)
    mults.foreach { x =>
      val train = (0 until x).map { k =>
        if (k == 0) train0
        else train0.select((col("doc_id") + k * 1000000L).as("doc_id"),
          regexp_replace(col("text"), " ", s" q$k").as("text"))
      }.reduce(_ unionByName _)
      def timeIt(f: => Long): (Long, Double) = {
        val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
      }
      val (exactRows, exactS) = timeIt(
        graft.dedup.Dedup.decontaminateSpans(train, eval, "text", "doc_id", 15).count())
      val (bloomRows, bloomS) = timeIt(
        graft.dedup.Dedup.bloomDecontaminateSpans(train, eval, "text", "doc_id", 15).count())
      val exactJoin = joinStrategy(
        graft.dedup.Dedup.decontaminateSpans(train, eval, "text", "doc_id", 15))
      assert(exactRows == bloomRows,
        s"bloom path diverged: exact=$exactRows bloom=$bloomRows")
      println(f"[bloomscale] x$x%-3d trainDocs=${train0.count() * x}%8d  " +
        f"exact=$exactS%6.1f s ($exactJoin)  bloom=$bloomS%6.1f s  spans=$exactRows")

      // the 100 TB regime, simulated: executors cannot afford to
      // broadcast the eval gram set (on the local box the optimizer
      // happily broadcasts tens of MB; on a real cluster a 10⁸-gram
      // build side is out of budget). Cap the broadcast threshold so
      // the exact path degrades to its true at-scale shape — a full
      // shuffle of EVERY train gram — while the Bloom path still
      // broadcasts its fixed-size sketch and shuffles only survivors.
      // Local wall time hides the difference (a single-box shuffle of
      // a few hundred MB is nearly free); the at-scale metric is
      // SHUFFLE VOLUME, tallied per path from stage metrics.
      val thr = "spark.sql.autoBroadcastJoinThreshold"
      val old = spark.conf.get(thr)
      try {
        spark.conf.set(thr, "-1")
        val (er2, es2, esh) = tallied(spark)(
          graft.dedup.Dedup.decontaminateSpans(train, eval, "text", "doc_id", 15).count())
        val (br2, bs2, bsh) = tallied(spark)(
          graft.dedup.Dedup.bloomDecontaminateSpans(train, eval, "text", "doc_id", 15).count())
        val ej2 = joinStrategy(
          graft.dedup.Dedup.decontaminateSpans(train, eval, "text", "doc_id", 15))
        val bj2 = joinStrategy(
          graft.dedup.Dedup.bloomDecontaminateSpans(train, eval, "text", "doc_id", 15))
        assert(er2 == br2, s"capped: exact=$er2 bloom=$br2")
        println(f"[bloomscale] x$x%-3d no-broadcast     " +
          f"exact=$es2%6.1f s / ${esh / 1e6}%8.1f MB shuffled ($ej2)  " +
          f"bloom=$bs2%6.1f s / ${bsh / 1e6}%8.1f MB shuffled ($bj2)  spans=$er2")
      } finally spark.conf.set(thr, old)
    }
    spark.stop()
  }

  /** Run `f`, returning (result, wall seconds, total shuffle-write
    * bytes of the jobs it triggered) via a transient stage listener. */
  private def tallied(spark: SparkSession)(f: => Long): (Long, Double, Long) = {
    val bytes = new java.util.concurrent.atomic.AtomicLong(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      // stage-completed events are delivered async; drain the bus so
      // the tally covers every stage of the measured jobs
      org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
      (r, s, bytes.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }

  private def joinStrategy(df: org.apache.spark.sql.DataFrame): String = {
    val p = df.queryExecution.executedPlan.toString
    if (p.contains("BroadcastHashJoin")) "broadcast-join"
    else if (p.contains("SortMergeJoin")) "sortmerge-join"
    else if (p.contains("ShuffledHashJoin")) "shuffledhash-join"
    else "other-join"
  }
}
