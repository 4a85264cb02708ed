package graft.ops

import graft.model.EntityModel
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-aware graph traversal over a VERSIONED entity log — the
  * reference's marquee capability: every query can run "as of" any
  * point in time (mimiro-io/datahub internal/server/store.go:999
  * `GetManyRelatedEntitiesAtTime`, store.go:1081 `GetRelatedAtTime`).
  *
  * Semantics, matching the reference's inverse-index walk
  * (store.go:1081) and deleted-ref handling (store.go:659): among a
  * relation's versions with `recorded <= t` the LATEST per entity wins,
  * and if that winning version is a tombstone the relation is
  * suppressed entirely — it reappears only if re-asserted later.
  *
  * Spark shape: `ChangeLog.asOf` (ONE max_by hash-aggregate shuffle,
  * map-side partial — not a window sort) followed by a map-only edge
  * projection. The reference walks a BadgerDB index range per start
  * entity; here the whole traversal is a single declarative plan over
  * the log, so at 100 TB the token filter prunes parquet row groups
  * (recorded is naturally write-ordered) and the one shuffle carries
  * only the latest-version winners.
  */
object TimeTravel {

  /** The log's entity state as of token `t`: latest version per id with
    * `recorded <= t`, tombstoned winners dropped. */
  def stateAt(log: DataFrame, idCol: String, recordedCol: String,
              deleted: Column, t: Long): DataFrame = {
    val flagged = log.withColumn("__deleted", deleted)
    ChangeLog.asOf(flagged, idCol, recordedCol, t)
      .filter(!col("__deleted"))
      .drop("__deleted")
  }

  /** Outgoing traversal as of token `t`: one edge per entity whose
    * current (as-of-t) version carries a non-null ref. */
  def outAtTime(log: DataFrame, idCol: String, recordedCol: String, deleted: Column,
                fkCol: String, t: Long, srcNs: String, predicate: String,
                tgtNs: String): DataFrame =
    stateAt(log, idCol, recordedCol, deleted, t)
      .filter(col(fkCol).isNotNull)
      .select(
        EntityModel.uri(srcNs, col(idCol)).as("start"),
        lit(predicate).as("predicate"),
        EntityModel.uri(tgtNs, col(fkCol)).as("related"),
        col(recordedCol).cast("long").as("recorded"))

  /** Inverse traversal as of token `t` (reference: `inverse: true`
    * against the time-filtered incoming index): entities whose
    * current-as-of-t ref points AT the target — the direction
    * `GetRelatedAtTime` actually walks. */
  def inAtTime(log: DataFrame, idCol: String, recordedCol: String, deleted: Column,
               fkCol: String, t: Long, srcNs: String, predicate: String,
               tgtNs: String): DataFrame =
    stateAt(log, idCol, recordedCol, deleted, t)
      .filter(col(fkCol).isNotNull)
      .select(
        EntityModel.uri(tgtNs, col(fkCol)).as("start"),
        lit(predicate).as("predicate"),
        EntityModel.uri(srcNs, col(idCol)).as("related"),
        col(idCol).cast("long").as("related_key"))
}
