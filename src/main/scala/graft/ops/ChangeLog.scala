package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-log operators over an entity version log.
  *
  * The reference stores every dataset as an immutable, monotonically
  * token-ordered change log (mimiro-io/datahub
  * internal/server/dataset.go:1005 `GetChanges(since, count,
  * latestOnly)`; internal/server/store.go:999
  * `GetManyRelatedEntitiesAtTime`; compaction `deduplicate` strategy:
  * internal/service/dataset/compact_stategy_deduplicate.go). Here a change log is any
  * DataFrame with:
  *   - `idCol`:       entity identity
  *   - `recordedCol`: monotone change token (the reference's `recorded`)
  *   - `deletedCol`:  optional tombstone flag
  *
  * Scale notes: `latestOnly`/`asOf` are ONE hash-aggregate shuffle via
  * `max_by(struct)` with map-side partial aggregation — not a global
  * window sort, which at 100 TB would shuffle-sort the entire log.
  * `compactDedup` needs per-entity ordering, so it uses a window
  * partitioned by entity id — the partition key carries the parallelism,
  * there is no single-reducer global sort.
  */
object ChangeLog {

  /** Reference: GET /datasets/{ds}/changes?since=token — incremental read.
    * The `recorded > since` predicate pushes down to the parquet scan
    * (min/max row-group pruning makes incremental reads cheap at scale).
    *
    * `sorted = false` skips the global token sort — SET-semantics
    * consumers (dependency tracking, fullsync staging, anything ending
    * in its own aggregate/join) don't need the ordering, and at scale
    * the sort is a full range-partition Exchange of the slice. A `limit`
    * forces the sort regardless: deterministic pagination is ordering. */
  def changesSince(log: DataFrame, recordedCol: String, since: Long, limit: Option[Int] = None,
                   sorted: Boolean = true): DataFrame = {
    val slice = log.filter(col(recordedCol) > since)
    val inc = if (sorted || limit.isDefined) slice.orderBy(col(recordedCol)) else slice
    limit.map(inc.limit).getOrElse(inc)
  }

  /** Persist a change log PARTITIONED by coarse token buckets
    * (`recorded div bucketSize` → one directory per bucket). At 100 TB
    * this is the storage layout `/changes?since=` needs: an incremental
    * read prunes whole partition DIRECTORIES at planning time (the
    * listing never touches old buckets), on top of the row-group min/max
    * pruning inside the current bucket. Append-mode works because new
    * tokens only ever land in the newest buckets. */
  def writePartitionedLog(log: DataFrame, recordedCol: String, path: String,
                          bucketSize: Long, mode: String = "overwrite"): Unit =
    log.withColumn("__rbucket", expr(s"$recordedCol div $bucketSize"))
      .write.mode(mode).partitionBy("__rbucket").parquet(path)

  /** Incremental read over a partitioned log (`writePartitionedLog`):
    * the bucket predicate prunes partitions, the token predicate prunes
    * row groups within the boundary bucket. Identical rows to
    * `changesSince` on the unpartitioned log. */
  def readChangesSince(spark: org.apache.spark.sql.SparkSession, path: String,
                       recordedCol: String, since: Long, bucketSize: Long): DataFrame =
    spark.read.parquet(path)
      .filter(col("__rbucket") >= since / bucketSize && col(recordedCol) > since)
      .drop("__rbucket")
      .orderBy(col(recordedCol))

  /** Reference: DatasetSource LatestOnly — newest version per entity.
    * Single shuffle: max_by over a struct of all payload columns keyed by
    * the recorded token.
    */
  def latestOnly(log: DataFrame, idCol: String, recordedCol: String): DataFrame = {
    val payload = struct(log.columns.map(col).toIndexedSeq: _*)
    log
      .groupBy(col(idCol).as("__id"))
      .agg(max_by(payload, col(recordedCol)).as("__latest"))
      .select("__latest.*")
  }

  /** Reference: time-travel — the graph state as of change-token `t`
    * (latest version per entity among versions with recorded <= t).
    */
  def asOf(log: DataFrame, idCol: String, recordedCol: String, t: Long): DataFrame =
    latestOnly(log.filter(col(recordedCol) <= t), idCol, recordedCol)

  /** Reference: deleted-flag semantics — a snapshot excludes entities
    * whose LATEST version is a tombstone, while `changes` still carries
    * them (so downstream syncs can propagate deletes).
    */
  def snapshot(log: DataFrame, idCol: String, recordedCol: String, deletedCol: Column): DataFrame = {
    val flagged = log.withColumn("__deleted", deletedCol)
    latestOnly(flagged, idCol, recordedCol)
      .filter(!col("__deleted"))
      .drop("__deleted")
  }

  /** As-of join: each probe row (entity, t) picks up the entity's
    * latest log version with recorded <= t — the join form of the
    * reference's time-travel (every query can run "as of" any token).
    *
    * Spark-first formulation: no per-probe lookup, no range join —
    * union the tagged probe rows into the log, one window pass ordered
    * by (token, kind) per entity carries the last seen version forward
    * into each probe row. ONE shuffle keyed by entity id, linear in
    * |log| + |probes|, any scale. (DuckDB's native ASOF JOIN is the
    * oracle.)
    */
  def asOfJoin(
      log: DataFrame, idCol: String, recordedCol: String, payloadCols: Seq[String],
      probes: DataFrame, probeIdCol: String, probeTimeCol: String
  ): DataFrame = {
    val payload = struct(payloadCols.map(col).toIndexedSeq: _*)
    val logT = log.select(
      col(idCol).as("__id"), col(recordedCol).cast("long").as("__t"),
      payload.as("__v"), lit(0).as("__kind"))
    val probeT = probes.select(
      col(probeIdCol).as("__id"), col(probeTimeCol).cast("long").as("__t"),
      lit(null).cast(logT.schema("__v").dataType).as("__v"), lit(1).as("__kind"))
    // log row sorts BEFORE a probe at the same token (kind 0 < 1): the
    // reference's asOf is inclusive of versions recorded exactly at t
    val w = Window.partitionBy(col("__id"))
      .orderBy(col("__t"), col("__kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    logT.unionByName(probeT)
      .withColumn("__latest", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__kind") === 1 && col("__latest").isNotNull)
      .select(col("__id") +: col("__t") +: payloadCols.map(c => col(s"__latest.$c").as(c)): _*)
  }

  /** Retention / garbage collection — reference
    * internal/server/garbagecollector.go: drop log versions older than
    * token `t` while KEEPING each entity's latest at-or-before-t version,
    * so every as-of query at tokens >= t (and every snapshot/latestOnly)
    * is unchanged; only pre-t history disappears. Deleted-at-t entities
    * keep their tombstone (it is their latest version), so deletion
    * semantics survive GC.
    *
    * One window pass partitioned by entity id over the `<= t` slice
    * (the partition key carries the parallelism — no global sort), and
    * the `> t` slice passes through untouched with its filter pushed to
    * the scan. */
  def retain(log: DataFrame, idCol: String, recordedCol: String, t: Long): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col(recordedCol).desc)
    val oldLatest = log.filter(col(recordedCol) <= t)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    oldLatest.unionByName(log.filter(col(recordedCol) > t))
  }

  /** Reference: POST /compaction {"strategy": "deduplicate"} — drop
    * successive versions of an entity whose payload is identical to the
    * previous version, retaining timeline correctness
    * (DOCUMENTATION.md "Compaction").
    *
    * @param payloadCols the columns that define version equality
    *                    (the reference compares id, deleted, props, refs)
    */
  def compactDedup(log: DataFrame, idCol: String, recordedCol: String, payloadCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col(recordedCol))
    val payload = struct(payloadCols.map(col).toIndexedSeq: _*)
    log
      .withColumn("__prev", lag(payload, 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= payload)
      .drop("__prev")
  }
}
