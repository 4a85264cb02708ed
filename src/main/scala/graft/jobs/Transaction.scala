package graft.jobs

import org.apache.spark.sql.DataFrame

/** Atomic multi-dataset write — the reference's transform `transactions`
  * (mimiro-io/datahub internal/jobs/transform.go:250 NewTransaction /
  * ExecuteTransaction; internal/server/dataset.go:265
  * StoreEntitiesWithTransaction: all writes land or none).
  *
  * Spark translation: every leg is materialized (validated) BEFORE any
  * leg becomes visible in the registry — a failing leg aborts the whole
  * transaction with the registry untouched. Each leg is staged as
  * parquet and published from the staged files (the cluster-scale
  * discipline: durable staging + metadata-only publish, the same
  * write-then-swap the reference's StoreEntitiesWithTransaction performs
  * inside Badger). The DEFAULT staging location is a generated temp dir
  * — right for local/single-node runs; on a cluster pass a shared
  * `stagingDir` (HDFS/S3) so executors and any restarted driver see the
  * staged files. `cacheStaging = true` opts into the in-memory
  * cache+count path instead — fine in-session, but CacheManager
  * plan-matching is measured to be erratic under memory pressure
  * (PERF.md), so it is no longer the default.
  */
final case class Transaction(writes: Seq[(String, DataFrame)], stagingDir: Option[String] = None,
                             cacheStaging: Boolean = false) {

  /** Validate-then-publish. Returns per-dataset row counts. */
  def commit(registry: DatasetRegistry): Seq[(String, Long)] = {
    val root =
      if (cacheStaging) None
      else stagingDir.orElse(
        Some(java.nio.file.Files.createTempDirectory("graft_txn_").toString))
    // stage: force full evaluation of every leg first (any error here
    // leaves the registry exactly as it was)
    val staged = writes.map { case (name, df) =>
      root match {
        case Some(r) =>
          val path = s"$r/$name"
          df.write.mode("overwrite").parquet(path)
          val back = df.sparkSession.read.parquet(path)
          (name, back, back.count())
        case None =>
          val cached = df.cache()
          (name, cached, cached.count())
      }
    }
    // publish: metadata-only, cannot fail partially
    staged.foreach { case (name, df, _) => registry.put(name, df) }
    staged.map { case (name, _, n) => name -> n }
  }
}

/** A virtual dataset — the reference's proxy/virtual datasets
  * (DOCUMENTATION.md "Virtual Datasets"): a dataset whose entities are
  * produced by a function instead of stored rows. In Spark the generator
  * returns a DataFrame (typically from `spark.range` or an external
  * call), so virtual datasets compose with every operator exactly like
  * stored ones. */
final case class VirtualDataset(name: String, gen: org.apache.spark.sql.SparkSession => DataFrame) {
  def read(spark: org.apache.spark.sql.SparkSession): DataFrame = gen(spark)
}
