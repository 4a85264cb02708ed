package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ann.{Ann, IvfPq, Pq}
import graft.functions.VectorFunctions.{dot, l2norm}

/** Published recall table for the ANN family (PERF.md): recall@k of
  * every approximate layout against the exact brute-force baseline,
  * with wall seconds beside it — the accuracy/speed trade a deployment
  * actually chooses between. Indexes build untimed (the
  * once-per-snapshot cost, as in SteadyState); each probe is
  * min-of-3 after warmup; recompute paths (s2/s3/s7) time their
  * inline build+query by design, matching their Bench figures.
  *
  * Recall@k = |approx top-k ∩ exact top-k| / k, averaged over the
  * query set; filtered variants (s10/s11) are scored against the
  * exact top-k RESTRICTED to qualifying neighbors — the faithful
  * baseline for pre-filtered search.
  *
  * `runMain graft.Recall [sfDir] [k] [nQueries]` (defaults /tmp/sf1,
  * 10, 50).
  */
object Recall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val nq = args.lift(2).map(_.toLong).getOrElse(50L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_recall_wh_").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    println(s"corpus: $n vectors, $nq queries, recall@$k")

    // exact ground truth (driver-held: nq × k pairs)
    val e = emb.select(col("vec_id").as("id"), col("embedding").as("v"), col("label"))
      .withColumn("norm", l2norm(col("v")))
    val q = e.filter(col("id") < nq).cache()
    def exactTopK(pred: Column): Map[Long, Set[Long]] = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
      e.filter(pred).as("x").join(broadcast(q.as("y")), col("x.id") =!= col("y.id"))
        .select(col("y.id").as("query_id"), col("x.id").as("neighbor_id"),
          (dot(col("x.v"), col("y.v")) / (col("x.norm") * col("y.norm"))).as("sim"))
        .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
        .select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    }
    val exact = exactTopK(lit(true))
    val exactFiltered = exactTopK(col("label") === 1)

    // standing indexes, built once and untimed
    Ann.buildAnnIndex(emb, "embedding", "vec_id", dims = 64, "rc_ann")
    Ann.buildIvfIndex(emb, "embedding", "vec_id", "rc_ivf", keep = Seq("label"))
    Pq.buildPqIndex(emb, "embedding", "vec_id", "rc_pq", dims = 64)
    IvfPq.buildIvfPqIndex(emb, "embedding", "vec_id", "rc_ivfpq", dims = 64,
      keep = Seq("label"))

    val qf = col("id") < nq
    val probes: Seq[(String, Boolean, () => DataFrame)] = Seq(
      ("s1_bruteforce", false,
        () => Ann.bruteForceTopK(emb, "embedding", "vec_id", qf, k)),
      ("s2_lsh", false,
        () => Ann.lshTopK(emb, "embedding", "vec_id", dims = 64, qf, k)),
      ("s3_ivf", false,
        () => Ann.ivfTopK(emb, "embedding", "vec_id", qf, k)),
      ("s4_lsh_indexed", false,
        () => Ann.lshTopKIndexed(spark, "rc_ann", qf, k)),
      ("s5_ivf_indexed", false,
        () => Ann.ivfTopKIndexed(spark, "rc_ivf", qf, k)),
      ("s7_pq", false,
        () => Pq.pqTopK(emb, "embedding", "vec_id", qf, k, dims = 64)),
      ("s8_pq_indexed", false,
        () => Pq.pqTopKIndexed(spark, "rc_pq", emb, "embedding", "vec_id", qf, k)),
      ("s9_ivfpq_indexed", false,
        () => IvfPq.ivfPqTopKIndexed(spark, "rc_ivfpq", emb, "embedding", "vec_id", qf, k)),
      ("s10_filtered_ivf", true,
        () => Ann.ivfTopKIndexed(spark, "rc_ivf", qf, k, neighborPred = col("label") === 1)),
      ("s11_filtered_ivfpq", true,
        () => IvfPq.ivfPqTopKIndexed(spark, "rc_ivfpq", emb, "embedding", "vec_id", qf, k,
          neighborPred = col("label") === 1)),
      // the accuracy/speed KNOBS, one sweep each: nprobe buys IVF
      // recall (nlist=16, so nprobe=16 probes everything — recall 1
      // at brute-force cost), shortlist buys back PQ's quantization
      // loss through the exact rerank
      ("s5_ivf nprobe=8", false,
        () => Ann.ivfTopKIndexed(spark, "rc_ivf", qf, k, nprobe = 8)),
      ("s5_ivf nprobe=16", false,
        () => Ann.ivfTopKIndexed(spark, "rc_ivf", qf, k, nprobe = 16)),
      ("s8_pq shortlist=200", false,
        () => Pq.pqTopKIndexed(spark, "rc_pq", emb, "embedding", "vec_id", qf, k,
          shortlist = 200)),
      ("s8_pq shortlist=1k", false,
        () => Pq.pqTopKIndexed(spark, "rc_pq", emb, "embedding", "vec_id", qf, k,
          shortlist = 1000)),
      ("s9_ivfpq np=8 sl=1k", false,
        () => IvfPq.ivfPqTopKIndexed(spark, "rc_ivfpq", emb, "embedding", "vec_id", qf, k,
          nprobe = 8, shortlist = 1000)))

    println(f"${"probe"}%-20s ${"recall@" + k}%-10s ${"min-of-3 s"}%-10s")
    probes.foreach { case (name, filtered, f) =>
      val rows = f().select("query_id", "neighbor_id").collect()
      val got = rows.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val base = if (filtered) exactFiltered else exact
      val recall = base.map { case (qid, truth) =>
        got.getOrElse(qid, Set.empty).count(truth).toDouble / truth.size
      }.sum / base.size
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f().count(); (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$name%-20s $recall%-10.3f $t%-10.2f")
    }
    spark.stop()
  }
}
