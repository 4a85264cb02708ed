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
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    graft.ann.Pq.buildPqIndex(emb, "embedding", "vec_id", "ss_pq", dims = 64)
    graft.ann.IvfPq.buildIvfPqIndex(emb, "embedding", "vec_id", "ss_ivfpq",
      dims = 64, keep = Seq("label"))
    graft.ann.Ann.buildIvfIndex(emb, "embedding", "vec_id", "ss_ivf", keep = Seq("label"))
    graft.dedup.Dedup.buildShingleIndex(docs.filter(col("doc_id") < 4500),
      "text", "doc_id", 3, "ss_shingle", buckets = 16)
    val vbatch = graft.ann.SemDedup.perturbedBatch(emb, "embedding", "vec_id")

    val probes: Seq[(String, () => Long)] = Seq(
      "s8 PQ probe (10 q)" ->
        (() => graft.ann.Pq.pqTopKIndexed(spark, "ss_pq", emb, "embedding", "vec_id",
          col("id") < 10, 5).count()),
      "s9 IVFxPQ probe (10 q)" ->
        (() => graft.ann.IvfPq.ivfPqTopKIndexed(spark, "ss_ivfpq", emb, "embedding", "vec_id",
          col("id") < 10, 5).count()),
      "s10 filtered IVF probe" ->
        (() => graft.ann.Ann.ivfTopKIndexed(spark, "ss_ivf", col("id") < 10, 5,
          neighborPred = col("label") === 1).count()),
      "s11 filtered IVFxPQ probe" ->
        (() => graft.ann.IvfPq.ivfPqTopKIndexed(spark, "ss_ivfpq", emb, "embedding", "vec_id",
          col("id") < 10, 5, neighborPred = col("label") === 1).count()),
      "d14 semantic delta (100 vecs)" ->
        (() => graft.ann.SemDedup.semanticDedupDelta(spark, vbatch, "embedding", "vec_id",
          "ss_ivf", 0.9).count()),
      "d15 semantic roster" ->
        (() => graft.ann.SemDedup.semanticDedupIndexed(spark, "ss_ivf", 0.4).count()),
      "d8 jaccard delta (500 docs)" ->
        (() => graft.dedup.Dedup.ngramJaccardDelta(spark,
          docs.filter(col("doc_id") >= 4500), "text", "doc_id", 3, 0.8, "ss_shingle").count())
    )
    probes.foreach { case (name, f) =>
      f() // warmup
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[steady] $name%-32s ${t}%6.2f s")
    }
    spark.stop()
  }
}
