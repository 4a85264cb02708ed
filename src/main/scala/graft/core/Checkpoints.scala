package graft.core

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative operators (BFS frontiers, label
  * propagation): each round must cut the plan or the DAG grows without
  * bound. Default is `localCheckpoint` — executor-local storage, zero
  * config, right for local/interactive runs — but it is NON-RELIABLE: at
  * cluster scale losing one executor loses checkpointed partitions and
  * kills the job. Setting `graft.checkpointDir` on the session switches
  * every iterative operator to RELIABLE checkpoints on that (HDFS/S3)
  * path, so an executor loss costs a recompute of one round, not the
  * job.
  *
  * Storage hygiene on the reliable path: each `truncate` writes one RDD
  * directory under the configured path, and superseded rounds are only
  * reclaimed when the driver GCs the RDD — which cleans the files IF
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (a STARTUP
  * conf; set it on the SparkSession builder, it cannot be flipped at
  * runtime). Long-lived clusters should enable it, or periodically
  * clear the checkpoint path between jobs. */
object Checkpoints {

  val ConfKey = "graft.checkpointDir"

  // last dir this object installed — re-install when the session conf
  // changes mid-session instead of silently keeping the stale path
  // (SparkContext stores a UUID-qualified subpath, so the raw conf
  // value must be tracked here to detect changes)
  private var installed: Option[String] = None
  private val rwLock = new java.util.concurrent.locks.ReentrantReadWriteLock()

  def truncate(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey) match {
      case Some(dir) =>
        // the checkpoint dir is SparkContext-GLOBAL while the conf is
        // per-session-clone: an install must exclude every in-flight
        // checkpoint so two clones configured with DIFFERENT dirs
        // cannot interleave and land checkpoints under each other's
        // path. A read-write lock keeps the common case concurrent —
        // callers whose dir is already installed (e.g. two streams
        // sharing one configured dir) checkpoint under the shared READ
        // lock in parallel; only a (re)install takes the write lock.
        val rl = rwLock.readLock()
        rl.lock()
        val fast =
          try {
            if (installed.contains(dir) && spark.sparkContext.getCheckpointDir.nonEmpty)
              Some(df.checkpoint())
            else None
          } finally rl.unlock()
        fast.getOrElse {
          val wl = rwLock.writeLock()
          wl.lock()
          try {
            if (!installed.contains(dir) || spark.sparkContext.getCheckpointDir.isEmpty) {
              spark.sparkContext.setCheckpointDir(dir)
              installed = Some(dir)
            }
            df.checkpoint()
          } finally wl.unlock()
        }
      case None => df.localCheckpoint()
    }
  }

  /** [[truncate]] plus the row count, measured DURING the checkpoint's
    * own materialization job via an observed metric (`Dataset.observe`
    * plants a pass-through CollectMetrics node whose accumulator the
    * eager checkpoint populates) — NO second driver action. For
    * operators that pin a batch and then branch on its size (e.g. the
    * simhash delta's all-pairs vs chunk-key leg), this keeps the
    * one-action-per-batch discipline the delta families share. */
  def truncateCounted(df: DataFrame): (DataFrame, Long) = {
    import org.apache.spark.sql.functions.{count, lit}
    val name = "graft.truncate.n"
    val observed = df.observe(name, count(lit(1)))
    val out = truncate(observed)
    val n = observed.queryExecution.observedMetrics.get(name) match {
      case Some(row) => row.getLong(0)
      case None =>
        // defensive: if an engine version stops materializing observed
        // metrics under checkpoint, fall back to the (cheap —
        // already-materialized input) explicit count rather than
        // miscounting as zero
        out.count()
    }
    (out, n)
  }

  /** [[truncate]] plus the SUM of a long column, measured during the
    * checkpoint's own materialization job (the [[truncateCounted]]
    * observed-metric trick for an arbitrary additive statistic). For
    * loops whose convergence test is a derived flag — label
    * propagation's "how many labels changed this round" — this fuses
    * the pin and the test into ONE driver action per round, instead of
    * a pin plus a separate join-and-count. An empty (or all-NULL)
    * input sums to 0. */
  def truncateSummed(df: DataFrame, sumCol: String): (DataFrame, Long) = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, sum}
    val name = "graft.truncate.sum"
    val observed = df.observe(name, coalesce(sum(col(sumCol)), lit(0L)))
    val out = truncate(observed)
    val n = observed.queryExecution.observedMetrics.get(name) match {
      case Some(row) if !row.isNullAt(0) => row.getLong(0)
      case _ =>
        val r = out.agg(coalesce(sum(col(sumCol)), lit(0L))).head()
        if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    (out, n)
  }
}
