package graft.jobs

import graft.ops.ChangeLog
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fullsync deletion detection — reference
  * mimiro-io/datahub internal/server/dataset.go:158 `CompleteFullSync`:
  * a fullsync job delivers the COMPLETE entity set of a source; when it
  * completes, every entity that was live before the sync but absent from
  * the batch is appended as a tombstone version, so downstream
  * incremental consumers see the deletion as a normal change.
  *
  * Spark shape: latest-live snapshot (one max_by hash-agg) anti-joined
  * against the batch's id set. The batch ids are the sync payload —
  * bounded by the source size, not the log — so the anti-join broadcasts
  * the id set; nothing shuffles the log beyond the snapshot's single
  * aggregate. At 100 TB the log-side scan prunes to the latest-version
  * winners before any join.
  */
object FullSync {

  /** The tombstone rows a completed fullsync must append: one
    * `(id, recorded = t, deleted = true)` per previously-live entity
    * not present in `batch`. */
  def deletionTombstones(log: DataFrame, idCol: String, recordedCol: String,
                         deleted: Column, batch: DataFrame, batchIdCol: String,
                         t: Long): DataFrame = {
    val live = ChangeLog.snapshot(log.withColumn("__del", deleted), idCol, recordedCol, col("__del"))
      .select(col(idCol))
    val batchIds = batch.select(col(batchIdCol).as(idCol)).distinct()
    live.join(broadcast(batchIds), Seq(idCol), "left_anti")
      .select(col(idCol), lit(t).as(recordedCol), lit(true).as("deleted"))
  }

  /** The post-sync log for a canonical entity log (boolean `deletedCol`):
    * original log plus the deletion tombstones projected onto the log's
    * schema (payload columns null). `ChangeLog.snapshot` on the result
    * hides the tombstoned entities; `ChangeLog.changesSince(t-1)`
    * carries them downstream. */
  def completeFullSync(log: DataFrame, idCol: String, recordedCol: String,
                       deletedCol: String, batch: DataFrame, batchIdCol: String,
                       t: Long): DataFrame = {
    val stones = deletionTombstones(log, idCol, recordedCol, col(deletedCol), batch, batchIdCol, t)
    val asLog = log.columns.map {
      case c if c == idCol => col(idCol)
      case c if c == recordedCol => col(recordedCol)
      case c if c == deletedCol => col("deleted").as(deletedCol)
      case c => lit(null).cast(log.schema(c).dataType).as(c)
    }
    log.unionByName(stones.select(asLog.toIndexedSeq: _*))
  }
}
