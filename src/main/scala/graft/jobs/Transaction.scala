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
  * inside Badger). The DEFAULT staging location is master-aware
  * (`Transaction.resolveStaging`): local masters stage in a JVM temp
  * dir (cleaned by a shutdown hook); a NON-LOCAL master derives a
  * shared path from `graft.checkpointDir` or fails fast — a
  * driver-local temp dir on a cluster would have each executor write
  * its parquet parts to its own filesystem, so the read-back (and the
  * published registry dataset) silently sees partial or empty data.
  * `cacheStaging = true` opts into the in-memory cache+count path
  * instead — fine in-session, but CacheManager plan-matching is
  * measured to be erratic under memory pressure (PERF.md), so it is
  * not the default.
  */
final case class Transaction(writes: Seq[(String, DataFrame)], stagingDir: Option[String] = None,
                             cacheStaging: Boolean = false) {

  /** Validate-then-publish. Returns per-dataset row counts. */
  def commit(registry: DatasetRegistry): Seq[(String, Long)] = {
    if (writes.isEmpty) return Seq.empty
    val spark = writes.head._2.sparkSession
    val root =
      if (cacheStaging) None
      else stagingDir.orElse(
        Some(Transaction.resolveStaging(spark.sparkContext.master,
          spark.conf.getOption(graft.core.Checkpoints.ConfKey))))
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

object Transaction {

  /** Staging-dir policy when the caller passed none, factored out for
    * direct spec coverage. Local masters stage in a JVM temp dir,
    * removed by a shutdown hook when the process exits (registry
    * datasets stay readable for the session's lifetime). Non-local
    * masters REQUIRE a shared filesystem: the path derives from
    * `graft.checkpointDir` (already the session's shared-durable-storage
    * contract for reliable checkpoints) or the commit fails fast. */
  // ONE shutdown hook draining a list: a hook per commit would pin a
  // Thread (and keep its dir alive) for every transaction of a
  // long-lived driver
  private val stagedDirs = new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]()
  private lazy val cleanupHook: Unit = Runtime.getRuntime.addShutdownHook(new Thread(() => {
    var f = stagedDirs.poll()
    while (f != null) { deleteRecursively(f); f = stagedDirs.poll() }
  }))

  private[graft] def resolveStaging(master: String, checkpointDir: Option[String]): String =
    if (master.startsWith("local")) {
      val dir = java.nio.file.Files.createTempDirectory("graft_txn_")
      cleanupHook
      stagedDirs.add(dir.toFile)
      dir.toString
    } else checkpointDir match {
      case Some(cp) =>
        s"$cp/graft_txn_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      case None => throw new IllegalArgumentException(
        s"Transaction on non-local master '$master' has no shared staging location: " +
          s"pass stagingDir, set ${graft.core.Checkpoints.ConfKey}, or use cacheStaging " +
          "(a driver-local temp dir would silently lose executor-written parts)")
    }

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(); ()
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
