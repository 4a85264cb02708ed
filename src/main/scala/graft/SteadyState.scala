package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-loop steady-state measurement (PERF.md): build every standing
  * index ONCE (untimed — the once-per-corpus-snapshot deployment
  * cost), then time the probe side alone, min of 3 passes. This is
  * the number a deployment pays per query/batch; the Bench figures
  * for s8-s11/d14/d15 include the inline build by design.
  *
  * `runMain graft.SteadyState [sfDir]` */
object SteadyState {

  /** Build every standing index (untimed) and return the named probe
    * thunks — the per-query/per-batch deployment cost. Keys are the
    * related SparkEntry query names so rounds compare machine-readably
    * (`Bench` emits them as the `steady_state` JSON line). */
  def probeSet(spark: SparkSession, sfDir: String): Seq[(String, () => Long)] = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // the shingle index holds most docs; the delta batch is the tail
    // (the operational regime: batch ≪ corpus). The 4500 cut is
    // sf0.1-shaped; at other SFs take the last ~10% of ids.
    val nDocs = docs.agg(max("doc_id")).head().getLong(0) + 1
    val cut = nDocs - math.max(1L, nDocs / 10)

    graft.ann.Pq.buildPqIndex(emb, "embedding", "vec_id", "ss_pq", dims = 64)
    graft.ann.IvfPq.buildIvfPqIndex(emb, "embedding", "vec_id", "ss_ivfpq",
      dims = 64, keep = Seq("label"))
    graft.ann.Ann.buildIvfIndex(emb, "embedding", "vec_id", "ss_ivf", keep = Seq("label"))
    graft.dedup.Dedup.buildShingleIndex(docs.filter(col("doc_id") < cut),
      "text", "doc_id", 3, "ss_shingle", buckets = 16)
    graft.dedup.Dedup.buildGramIndex(docs.filter(col("doc_id") < cut),
      "text", "doc_id", 15, "ss_gram", buckets = 16)
    graft.dedup.Dedup.buildSimhashIndex(docs.filter(col("doc_id") < cut),
      "text", "doc_id", 10, "ss_simhash", buckets = 16)
    val vbatch = graft.ann.SemDedup.perturbedBatch(emb, "embedding", "vec_id")
    // the incremental-recipe refinery: standing corpus = first 80%,
    // eval = next 10%, the probed batch = the last 10% — the
    // per-batch marginal of the p12 pipeline with every standing
    // table prebuilt (processBatch never absorbs here, so the probe
    // is repeatable)
    val cut2 = nDocs - 2 * math.max(1L, nDocs / 10)
    val rst = graft.jobs.Recipe.buildStanding(spark,
      docs.filter(col("doc_id") < cut2).withColumn("label", col("doc_id") % 4 =!= 1),
      docs.filter(col("doc_id") >= cut2 && col("doc_id") < cut),
      "text", "doc_id", "lang", "label", k = 15,
      graft.text.Bpe.DefaultMerges, prefix = "ss_recipe", buckets = 16)
    // the standing artifacts p22/d25 consume at deployment (built once
    // per dedup'd snapshot, untimed): the near-dup cluster assignment
    // and the per-doc quality scores — the Bench p22/d25 figures price
    // the inline pair-pipeline build by design (PERF.md); these probes
    // measure the per-split / per-decision marginal
    // Tables.drop first: a leftover warehouse directory from a PREVIOUS
    // session is unknown to this catalog and saveAsTable then refuses
    // the name (LOCATION_ALREADY_EXISTS — bit the r14 bench re-capture)
    Seq("ss_clusters", "ss_scores", "ss_splits", "ss_bpairs")
      .foreach(graft.core.Tables.drop(spark, _))
    graft.dedup.Dedup.clusters(
        graft.dedup.Dedup.ngramJaccard(docs, "text", "doc_id", 3, 0.8))
      .write.mode("overwrite").saveAsTable("ss_clusters")
    graft.text.TextAnalysis.qualityScore(docs, "text", "doc_id")
      .select(col("doc_id"), col("quality"))
      .write.mode("overwrite").saveAsTable("ss_scores")
    // p25's standing artifacts: the persisted split verdicts and ONE
    // delta batch's pairs (the d8 delta over the tail batch) — both
    // built untimed so the probe prices ONLY splitDriftProbe's
    // broadcast-sliced joins, not the pair generation it monitors
    graft.dedup.Dedup.leakProofSplitAssigned(docs, "doc_id",
        spark.table("ss_clusters"), holdBp = 2000)
      .select(col("cluster_id"), col("split")).distinct()
      .write.mode("overwrite").saveAsTable("ss_splits")
    graft.dedup.Dedup.ngramJaccardDelta(spark,
        docs.filter(col("doc_id") >= cut), "text", "doc_id", 3, 0.8, "ss_shingle")
      .select(col("a"), col("b"))
      .write.mode("overwrite").saveAsTable("ss_bpairs")
    // the standing corpus-stats state (x18's deployment shape): built
    // once untimed; the probe prices the READ-OUT marginal (the
    // mutating absorb is priced by StatsStateScale, which a repeatable
    // min-of-3 probe cannot do honestly)
    graft.text.StatsState.buildStatsState(docs, "text", "lang", "doc_id", "ss_stats")
    // the standing retention state (e9's deployment shape): built once
    // untimed; the probe prices the triangle READ-OUT marginal (the
    // mutating absorb is replay-guarded, so a repeatable min-of-3
    // cannot price it honestly — the x18 discipline)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    graft.ops.Retention.buildRetentionState(ev, "ts", "user_id",
      604800000000L, "ss_retention")
    // d30's standing media index (built once per corpus snapshot,
    // untimed): the probe prices the per-ingest-batch marginal — embed
    // the re-ingest batch + the cell-routed delta screen (cluster +
    // keep-best ride the surfaced pairs, batch-bounded)
    val mediaEmb = graft.multimodal.Multimodal.embed(
      graft.multimodal.Multimodal.mediaFromDocs(docs)).toDF()
    graft.ann.Ann.buildIvfIndex(mediaEmb, "embedding", "doc_id", "ss_mivf")
    val mediaBatch = graft.core.Checkpoints.truncate(
      graft.ann.SemDedup.perturbedBatch(mediaEmb, "embedding", "doc_id",
        offset = 10000000L))

    Seq(
      // data-independent CPU-bound kernel, timed exactly like the
      // probes (min-of-3 after warmup): measures the machine's
      // effective compute throughput AT PROBE TIME — host-level
      // co-tenant contention is invisible to guest loadavg but shows
      // up here, and the bench gate divides probe ratios by this
      // kernel's ratio so a loaded host doesn't read as a regression
      // (r8/r9 postmortem: uniform 1.5-4x drift across unrelated
      // probes with zero code change). Leading underscore: not a
      // query probe, never compared directly.
      // bit_xor, not sum: ANSI mode (Spark 4 default) raises on long
      // overflow, and 200M hash values overflow a long sum
      "_calibration" -> (() => calibrationKernel(spark)),
      "s8_pq_probe" ->
        (() => graft.ann.Pq.pqTopKIndexed(spark, "ss_pq", emb, "embedding", "vec_id",
          col("id") < 10, 5).count()),
      "s9_ivfpq_probe" ->
        (() => graft.ann.IvfPq.ivfPqTopKIndexed(spark, "ss_ivfpq", emb, "embedding", "vec_id",
          col("id") < 10, 5).count()),
      "s10_filtered_probe" ->
        (() => graft.ann.Ann.ivfTopKIndexed(spark, "ss_ivf", col("id") < 10, 5,
          neighborPred = col("label") === 1).count()),
      "s11_filtered_ivfpq_probe" ->
        (() => graft.ann.IvfPq.ivfPqTopKIndexed(spark, "ss_ivfpq", emb, "embedding", "vec_id",
          col("id") < 10, 5, neighborPred = col("label") === 1).count()),
      "d14_semantic_delta" ->
        (() => graft.ann.SemDedup.semanticDedupDelta(spark, vbatch, "embedding", "vec_id",
          "ss_ivf", 0.9).count()),
      "d15_semantic_roster" ->
        (() => graft.ann.SemDedup.semanticDedupIndexed(spark, "ss_ivf", 0.4).count()),
      "d8_jaccard_delta" ->
        (() => graft.dedup.Dedup.ngramJaccardDelta(spark,
          docs.filter(col("doc_id") >= cut), "text", "doc_id", 3, 0.8, "ss_shingle").count()),
      // d28's deployment marginal: the per-ingest-batch quote/excerpt
      // screen against the standing shingle index — the same
      // bucket-riding join as d8 with the containment tail
      "d28_containment_probe" ->
        (() => graft.dedup.Dedup.containmentDelta(spark,
          docs.filter(col("doc_id") >= cut), "text", "doc_id", 3, 0.9, "ss_shingle").count()),
      "d18_substring_delta" ->
        (() => graft.dedup.Dedup.substringSpansDelta(spark,
          docs.filter(col("doc_id") >= cut), "text", "doc_id", 15, "ss_gram").count()),
      "p12_recipe_delta" ->
        (() => graft.jobs.Recipe.processBatch(spark, rst,
          docs.filter(col("doc_id") >= cut), "text", "doc_id", "lang",
          Map("en" -> 30000L), k = 15, graft.text.Bpe.DefaultMerges)
          .emission.count()),
      "d22_simhash_delta" ->
        (() => graft.dedup.Dedup.simhashPairsDelta(spark,
          docs.filter(col("doc_id") >= cut), "text", "doc_id", 10, "ss_simhash").count()),
      // p22's deployment marginal: split decision from the STANDING
      // cluster assignment — broadcast join + map-side decision; the
      // inline pair-pipeline build the Bench figure prices never runs
      "p22_split_probe" ->
        (() => graft.dedup.Dedup.leakProofSplitAssigned(docs, "doc_id",
          spark.table("ss_clusters"), holdBp = 2000).count()),
      // d25's deployment marginal: keep-best survivor ranking over the
      // standing assignment joined to standing scores — the shuffle is
      // bounded by duplicated docs, never the corpus
      "d25_keepbest_probe" ->
        (() => graft.dedup.Dedup.keepBest(spark.table("ss_clusters"),
          spark.table("ss_scores"), "doc_id", "quality").count()),
      // p25's deployment marginal: the bridge-drift classification of
      // ONE delta batch's pairs against the standing assignment +
      // persisted verdicts — broadcast-sliced joins, bounded by the
      // batch's pairs; the pair generation it monitors is priced by
      // d8_jaccard_delta and the Bench p25 figure prices the inline
      // once-per-snapshot chain
      "p25_drift_probe" ->
        (() => graft.dedup.Dedup.splitDriftProbe(spark.table("ss_bpairs"),
          spark.table("ss_clusters"), spark.table("ss_splits")).count()),
      // the standing-stats read-out marginal: net the contribution log
      // (riding its token buckets) + merge the sketch rows — what a
      // corpus-health dashboard pays per refresh against standing state
      "x18_readout_probe" ->
        (() => graft.text.StatsState.tokenStatsReadout(spark, "ss_stats")
          .join(graft.text.StatsState.kmvReadout(spark, "ss_stats"), Seq("group"))
          .count()),
      // e9's deployment marginal: the retention-triangle refresh a
      // dashboard pays against standing state — cell counts over
      // `_active` + broadcast cohort sizes, never the event log
      "e9_retention_probe" ->
        (() => graft.ops.Retention.retentionReadout(spark, "ss_retention").count()),
      // d30's deployment marginal: the per-ingest media-batch near-dup
      // screen against the standing media index (the pairs feed the
      // batch-bounded cluster/keep-best tail)
      "d30_media_probe" ->
        (() => graft.ann.SemDedup.semanticDedupDelta(spark, mediaBatch,
          "embedding", "doc_id", "ss_mivf", 0.9999).count()),
      // event-time probe (r8 postmortem: the e-family broke on a testdata
      // re-encode and no gate noticed) — batch sessionize over the events
      // log, the same single session_window hash-agg shuffle e2/e5 share
      "e2_sessionize" ->
        (() => graft.ops.Events.sessionize(ev, "ts", "user_id", "2 hours").count())
    )
  }

  /** The data-independent CPU-bound calibration kernel shared by the
    * steady-state probe set and the driver Bench line: 200M xxhash64
    * values folded with bit_xor (ANSI-safe — a long SUM overflows).
    * Measures the machine's effective compute throughput at run time;
    * host-level co-tenant contention is invisible to guest loadavg
    * but shows up here, so comparers divide probe ratios by the
    * kernel ratio (tools/selfcheck.py --bench). */
  def calibrationKernel(spark: SparkSession): Long =
    spark.range(0L, 200000000L, 1L, 32)
      .agg(expr("bit_xor(xxhash64(id))")).head().getLong(0)

  /** Min-of-`passes` kernel seconds after one warmup — the machine
    * factor to divide by when comparing two runs' timings. */
  def calibrationSeconds(spark: SparkSession, passes: Int = 3): Double = {
    calibrationKernel(spark)
    (1 to passes).map { _ =>
      val t0 = System.nanoTime(); calibrationKernel(spark); (System.nanoTime() - t0) / 1e9
    }.min
  }

  /** Min-of-`passes` probe seconds after one warmup each. A failed
    * probe reports -1 (the Bench sentinel) instead of killing the
    * remaining probes.
    *
    * Besides the `_calibration` probe (min-of-3 at ONE point in time),
    * the kernel is SAMPLED once after every probe and the MEAN is
    * reported as `_calibration_mean`: host co-tenancy is bursty, and a
    * ~0.3 s min-of-3 can land in a quiet slice of a loaded run (the
    * r12 postmortem — two re-runs on unchanged code read >1.5×
    * "normalized regressions" because the kernel sampled fast while
    * the probes ran under load; one even sampled FASTER than the
    * quiet baseline, inflating every ratio). The run-averaged mean is
    * the factor comparers should prefer when both artifacts carry it
    * (tools/selfcheck.py --bench does); min stays for old baselines. */
  def measure(spark: SparkSession, sfDir: String, passes: Int = 3): Seq[(String, Double)] = {
    val samples = scala.collection.mutable.ArrayBuffer.empty[Double]
    def sampleKernel(): Unit =
      try {
        val t0 = System.nanoTime(); calibrationKernel(spark)
        samples += (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => () }
    val probes = probeSet(spark, sfDir).map { case (name, f) =>
      val r = try {
        f() // warmup
        name -> (1 to passes).map { _ =>
          val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
        }.min
      } catch {
        case e: Throwable =>
          System.err.println(s"[steady] $name FAILED: ${e.getMessage}")
          name -> -1.0
      }
      sampleKernel() // one mid-run contention sample per probe
      r
    }
    probes :+ ("_calibration_mean" ->
      (if (samples.nonEmpty) samples.sum / samples.size else -1.0))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_steady_wh_").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    measure(spark, sfDir).foreach { case (name, t) =>
      println(f"[steady] $name%-28s ${t}%6.2f s")
    }
    spark.stop()
  }
}
