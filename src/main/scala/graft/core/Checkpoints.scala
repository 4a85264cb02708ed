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
  * job. */
object Checkpoints {

  val ConfKey = "graft.checkpointDir"

  def truncate(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey) match {
      case Some(dir) =>
        if (spark.sparkContext.getCheckpointDir.isEmpty)
          spark.sparkContext.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
  }
}
