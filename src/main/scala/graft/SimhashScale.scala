package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** d22 growth diagnosis (PERF.md): decompose the simhash delta probe's
  * sf0.1 → sf1 growth into candidate volume vs surviving-pair volume.
  * The chunk-pair candidate generator is lossless, so wall growth can
  * come from (a) bucket-occupancy blowup — candidates ≫ survivors,
  * the fixable-by-wider-keys case — or (b) genuine within-radius pair
  * growth — candidates ≈ survivors, where the probe is output-bound
  * and key widening cannot help.
  *
  * `runMain graft.SimhashScale [sfDir ...]` (default sf0.1 + /tmp/sf1)
  */
object SimhashScale {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
               else Seq("/root/testdata/sf0.1", "/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dirs.foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val nDocs = docs.agg(max("doc_id")).head().getLong(0) + 1
      val cut = nDocs - math.max(1L, nDocs / 10)
      val standing = docs.filter(col("doc_id") < cut)
      val batch = docs.filter(col("doc_id") >= cut)
      Dedup.buildSimhashIndex(standing, "text", "doc_id", 10, "shsc_idx", buckets = 16)

      // RAW probe-hit volume (pre any filter): batch-internal +
      // batch×corpus bucket-join rows — the map-side work the
      // generator always pays
      val bfps = graft.core.Checkpoints.truncate(
        Dedup.simhash(batch, "text", "doc_id"))
      val bkeys = bfps.select(col("id"), col("simhash"),
        explode(Dedup.chunkPairKeysFor(col("simhash"), 10)).as("bk"))
      val internal = bkeys.as("x").join(bkeys.as("y"),
        col("x.bk") === col("y.bk") && col("x.id") < col("y.id")).count()
      val batchIds = batch.select(col("doc_id").as("id")).distinct()
      val cross = bkeys.as("x").join(
          spark.table("shsc_idx").join(broadcast(batchIds), Seq("id"), "left_anti").as("y"),
          col("x.bk") === col("y.bk") && col("x.id") =!= col("y.id")).count()
      // EMITTED candidates (post exact-once combo filter) — what the
      // dedup Exchange actually carries
      val emitted = Dedup.simhashCandidates(bfps, 10).count()
      // surviving distinct pairs (the probe's output)
      val pairs = Dedup.simhashPairsDelta(spark, batch, "text", "doc_id", 10, "shsc_idx")
      val survivors = pairs.count()
      // probe wall, min of 3 (the SteadyState discipline)
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        Dedup.simhashPairsDelta(spark, batch, "text", "doc_id", 10, "shsc_idx").count()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$dir%-24s docs=$nDocs%7d batch=${nDocs - cut}%6d " +
        f"rawhits=${internal + cross}%10d (internal=$internal%d cross=$cross%d) " +
        f"emitted(internal)=$emitted%9d survivors=$survivors%9d wall=$t%.2f s")
    }
    spark.stop()
  }
}
