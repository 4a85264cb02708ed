package graft

import org.apache.spark.sql.SparkSession

/** Benchmark entry: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE raw JSON line with per-query and
  * total wall seconds. A warmup pass first triggers JIT + codegen +
  * parquet footer caching, then each query is timed SPARK_GRAFT_PASSES
  * times (default 2) and the MINIMUM is reported — min-of-passes is
  * the standard steady-state estimator and absorbs co-tenant load
  * spikes on a shared box (a whole round's bench was once discarded as
  * noise because single-pass numbers caught a busy machine; the min of
  * two passes cannot be slower than either).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // single-file testdata only splits at row-group boundaries; big
      // SF dirs (tools/scalegen.py) need smaller splits to use every
      // core on the scan stage (default left alone for the driver)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAXPART", "134217728"))
      // run-scoped warehouse (same rationale as Verify): no concurrent
      // or stale process shares this run's standing tables.
      // SPARK_GRAFT_WH pins a fixed location instead — the A/B knob
      // that adjudicated the r17 x18 drift (PERF.md: warehouse
      // location measured neutral; /tmp and the repo dir share one fs)
      .config("spark.sql.warehouse.dir",
        sys.env.getOrElse("SPARK_GRAFT_WH",
          java.nio.file.Files.createTempDirectory("graft_bench_wh_").toString))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_ONLY=d3_minhash_lsh,d2_ngram_jaccard → profile a subset
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // warmup: execute everything once (errors surface in the timed pass)
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    // drop the previous query's pinned blocks (localCheckpoint RDDs stay
    // in the BlockManager until the driver GCs them) — without this the
    // 72-query run accumulates dead blocks and later queries pay the
    // memory pressure of every earlier one
    def release(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.sharedState.cacheManager.clearCache()
    }
    val passes = math.max(1, sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt)
    val results = names.map { n =>
      val times = (1 to passes).map { _ =>
        release()
        val t0 = System.nanoTime()
        val ok =
          try { SparkEntry.queries(n)(spark, sfDir).count(); true }
          catch {
            case e: Throwable =>
              System.err.println(s"[bench] $n FAILED: ${e.getMessage}")
              false
          }
        // a failed pass must not masquerade as a fast one: its
        // time-to-failure is excluded from the min
        if (ok) (System.nanoTime() - t0) / 1e9 else Double.MaxValue
      }
      // every pass failed → report -1, unmistakably not a timing
      n -> (if (times.min == Double.MaxValue) -1.0 else times.min)
    }
    // millisecond precision keeps the line SHORT: the driver's tail
    // capture truncated the r3 line (full-precision doubles × 71 queries
    // overflowed it, BENCH_r03.json parsed:null)
    def ms(v: Double): String = (math.rint(v * 1000) / 1000).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + ms(v) }.mkString("{", ",", "}")
    // failure sentinels (-1) stay visible per-query but must not
    // deflate the headline total into a phantom speedup
    val total = results.map(_._2).filter(_ >= 0).sum
    val nFailed = results.count(_._2 < 0)
    // full per-query line — artifact only: at 106 queries it exceeds the
    // driver's 2000-char stdout tail capture and was truncated mid-JSON
    // three rounds running (BENCH_r06..r08 `parsed: null`)
    val timedLine =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // stdout gets a SHORT parseable line instead: headline total +
    // query count + failure count + the flagship q* timings PLUS a few
    // heavy parallelizable queries (r18 verdict #5: the q* set is all
    // sub-second and fixed-overhead-bound at sf0.1, so the driver's
    // 8-vs-32-core scaling block read ≈1 regardless of operator
    // quality — these four carry real parallel work). Additions only:
    // nothing removed or renamed.
    val headlineExtra = Set("d2_ngram_jaccard", "d4_simhash",
      "x16_ngram_kmv", "p3_clean_pipeline")
    val headline = results
      .filter { case (k, _) => k.startsWith("q") || headlineExtra(k) }
      .map { case (k, v) => "\"" + k + "\":" + ms(v) }.mkString("{", ",", "}")
    // machine-drift calibration IN the driver's short line (r9 verdict
    // #6): the same data-independent kernel the steady-state gate
    // normalizes by, min-of-3 after warmup — round-over-round driver
    // totals become machine-normalizable from BENCH_rN.json alone,
    // without the local artifacts. -1 = kernel failed, not a timing.
    val calib =
      try SteadyState.calibrationSeconds(spark)
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] calibration FAILED: ${e.getMessage}"); -1.0
      }
    val stdoutLine =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","n_queries":${results.size},"n_failed":$nFailed,"calibration":${ms(calib)},"queries":$headline,"sf":"$sfDir","artifact":"per-query detail in SPARK_GRAFT_BENCH_OUT file"}"""
    // capture-independent artifact (the driver's record is a 2000-char
    // stdout TAIL; per-query history must not live only in prose).
    // FileWriter, not PrintWriter: PrintWriter swallows IOExceptions
    // and a truncated artifact would masquerade as the run's record.
    // A bad path must not crash a finished bench either — warn and go.
    def writeArtifact(lines: Seq[String]): Unit =
      sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
        try {
          val w = new java.io.FileWriter(p)
          try lines.foreach(l => w.write(l + "\n")) finally w.close()
        } catch {
          case e: java.io.IOException =>
            System.err.println(s"[bench] artifact write failed: ${e.getMessage}")
        }
      }
    // durable BEFORE the steady-state stage: if that stage deadlocks or
    // the JVM dies, the 99-query timed section must already be on disk
    writeArtifact(Seq(timedLine))
    // steady-state probe timings (indexes built untimed, probes
    // min-of-3) — the per-query deployment cost of the index-family
    // queries, whose Bench figures deliberately price the inline
    // build. SPARK_GRAFT_STEADY=0 skips. Runs BEFORE the lines print:
    // the driver's record is a 2000-char stdout TAIL, and twice
    // (r6, r7) log chatter emitted during this stage scrolled the
    // timed line out of it — whatever this stage logs, both JSON
    // lines now land after it, timed line LAST.
    val steadyLine: Option[String] =
      if (sys.env.getOrElse("SPARK_GRAFT_STEADY", "1") != "0" && only.isEmpty) {
        // a steady-state failure must not discard the timed section
        try {
          release()
          val ss = SteadyState.measure(spark, sfDir)
          val ssq = ss.map { case (k, v) => "\"" + k + "\":" + ms(v) }.mkString("{", ",", "}")
          // -1 failure sentinels stay per-query but don't deflate the sum
          val ssTotal = ss.map(_._2).filter(_ >= 0).sum
          Some(s"""{"metric":"steady_state","value":${ms(ssTotal)},"unit":"sec","queries":$ssq,"sf":"$sfDir"}""")
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] steady_state FAILED: ${e.getMessage}"); None
        }
      } else None
    // nothing may log after the JSON lines: shutdown WARNs from
    // spark.stop() land in the same captured stream
    spark.sparkContext.setLogLevel("ERROR")
    // parseable lines on stdout (build.sbt forwards forked stdout raw);
    // the SHORT line goes last — the driver's capture is a stdout TAIL,
    // so the line that must survive truncation prints at the very end
    steadyLine.foreach(println)
    println(stdoutLine)
    writeArtifact(steadyLine.toSeq :+ timedLine)
    spark.stop()
  }
}
