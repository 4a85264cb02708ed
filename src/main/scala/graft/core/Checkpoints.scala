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
}
