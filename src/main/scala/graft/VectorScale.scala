package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-loop scale proof for the incremental VECTOR ingest path
  * (PERF.md) — the d14/d11 counterpart of DedupScale: grow the
  * standing vector corpus 1×/10×/100× at a FIXED ingest batch size
  * and time (a) the d14 cell-routed delta probe and (b) the absorb
  * tick into the standing inverted file.
  *
  * The corpus is synthetic: deterministic md5-derived 64-dim vectors
  * (components uniform in [-0.5, 0.5]), so cross sims concentrate
  * near 0 and the planted batch (perturbed copies of the first 100
  * vectors) keeps the output pair count CONSTANT while the corpus
  * grows — isolating pure corpus-size effects.
  *
  * The quantizer follows the SemDeDup sizing policy nlist ≈ √n: cell
  * occupancy (and with it the per-batch-member candidate count) then
  * grows as √n instead of linearly, which is the knob that keeps the
  * cluster-local pair scan tractable at billion-vector scale.
  *
  * `runMain graft.VectorScale [baseN] [multipliers...]` */
object VectorScale {
  def main(args: Array[String]): Unit = {
    val baseN = args.headOption.map(_.toInt).getOrElse(2000)
    val mults = (if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 10, 100))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_vscale_wh_").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def vecs(n: Long): org.apache.spark.sql.DataFrame =
      spark.range(n).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), d =>
          (conv(substring(md5(concat(col("id"), lit(":"), d)), 1, 4), 16, 10)
            .cast("double") / 65536.0d - 0.5d).cast("float")).as("embedding"))

    mults.foreach { x =>
      val n = baseN.toLong * x
      val corpus = vecs(n)
      // fixed batch: perturbed copies of the first 100 corpus vectors
      // under fresh ids — each has exactly one ≥0.9 neighbor at every
      // multiplier, so `pairs` staying constant certifies correctness
      // (the canonical construction; small eps keeps unit-norm-less
      // synthetic vectors inside the 0.9 band)
      val batch = graft.ann.SemDedup.perturbedBatch(corpus, "embedding", "vec_id",
        offset = 990000000L, eps = 0.01d)
      val nlist = math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)
      // cap k-means training at ~20k deterministically-sampled vectors:
      // the router needs the cluster structure, not every row
      val trainFrac = math.min(1.0, 20000.0 / n)
      val table = s"vscale_idx_$x"
      var t0 = System.nanoTime()
      graft.ann.Ann.buildIvfIndex(corpus, "embedding", "vec_id", table,
        nlist = nlist, trainFrac = trainFrac)
      val buildS = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val pairs = graft.ann.SemDedup
        .semanticDedupDelta(spark, batch, "embedding", "vec_id", table, 0.9).count()
      val deltaS = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      graft.ann.Ann.absorbIntoIvfIndex(spark, batch, "embedding", "vec_id", table)
      val absorbS = (System.nanoTime() - t0) / 1e9
      println(f"[vscale] x$x%-3d corpus=$n%8d vecs  nlist=$nlist%4d  build=$buildS%7.1f s  " +
        f"delta=$deltaS%6.2f s  absorb=$absorbS%6.2f s  pairs=$pairs")
    }
    spark.stop()
  }
}
