package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sharded corpus export — the last mile of the training-data
  * pipeline: write a cleaned corpus as a fixed number of shard
  * directories a data loader can map workers onto, plus a manifest.
  *
  * Shard assignment is the DETERMINISTIC md5 uniform
  * (`TextAnalysis.sampleHash % shards`), not `spark_partition_id` or
  * round-robin: re-running the export on any cluster size, partition
  * layout or engine lands every row in the same shard, so incremental
  * re-exports and cross-engine verification are exact. The write is
  * one `partitionBy(__shard)` pass — rows stream map-only into their
  * shard directory; no global sort, no repartition barrier (pass
  * `coalesceFiles = true` to shuffle once on the shard key and get
  * one file per shard for file-count-sensitive loaders). */
object Export {

  /** Write `df` under `dir` as `__shard=N/...` parquet and return the
    * per-shard manifest `(shard, n_rows, n_bytes)` read back from the
    * written files (footer-only byte counts via `Statistics`). */
  def shardedExport(df: DataFrame, idCol: String, dir: String, shards: Int,
                    coalesceFiles: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    val withShard = df.withColumn("__shard",
      pmod(graft.text.TextAnalysis.sampleHash(col(idCol), "shard"), lit(shards.toLong)))
    val writeDf = if (coalesceFiles) withShard.repartition(shards, col("__shard")) else withShard
    writeDf.write.mode("overwrite").partitionBy("__shard").parquet(dir)
    manifest(spark, dir, shards)
  }

  /** The manifest of an exported directory: one row per shard with its
    * row count and data bytes (parquet footers only — no data read).
    * Pass `shards` to get a FULL roster — hash buckets that received
    * zero rows write no partition directory, but a loader mapping
    * workers onto the advertised shard count needs their (0, 0) rows.
    *
    * Footer reads are DISTRIBUTED: the driver only lists file names
    * (the same metadata walk query planning does anyway); the
    * per-file footer I/O — the part that serializes painfully at tens
    * of thousands of shards — runs as a `mapPartitions` over the file
    * list, with the Hadoop conf rebuilt per task from its (tiny,
    * serializable) key-value entries. */
  def manifest(spark: SparkSession, dir: String, shards: Int = 0): DataFrame = {
    import spark.implicits._
    val written = spark.read.parquet(dir)
    val counts = written.groupBy(col("__shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_rows"))
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    val shardFiles: Seq[(Long, String)] = fs
      .listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("__shard="))
      .toSeq.flatMap { s =>
        val shard = s.getPath.getName.stripPrefix("__shard=").toLong
        Statistics.listParquetFiles(conf, s.getPath.toString).map(shard -> _)
      }
    // Configuration is not serializable; its entries are
    val confKV: Seq[(String, String)] = {
      import scala.jdk.CollectionConverters._
      conf.iterator().asScala.map(e => (e.getKey, e.getValue)).toSeq
    }
    val bytes = spark.createDataset(shardFiles)
      .mapPartitions { it =>
        val c = new org.apache.hadoop.conf.Configuration(false)
        confKV.foreach { case (k, v) => c.set(k, v) }
        it.map { case (shard, f) =>
          (shard, Statistics.footerDataBytes(c, new org.apache.hadoop.fs.Path(f)))
        }
      }
      .toDF("shard", "fb")
      .groupBy("shard").agg(sum("fb").as("n_bytes"))
    val present = counts.join(bytes, Seq("shard"))
    val full =
      if (shards <= 0) present
      else spark.range(shards).select(col("id").as("shard"))
        .join(present, Seq("shard"), "left")
        .select(col("shard"),
          coalesce(col("n_rows"), lit(0L)).as("n_rows"),
          coalesce(col("n_bytes"), lit(0L)).as("n_bytes"))
    full.orderBy("shard")
  }
}
