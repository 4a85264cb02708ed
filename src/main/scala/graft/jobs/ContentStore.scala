package graft.jobs

import graft.ops.ChangeLog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stored content — the reference keeps named JSON config blobs behind
  * its API (mimiro-io/datahub internal/content/content.go: add / update
  * / delete / list of content entries, used for transform configs and
  * mapping documents).
  *
  * Spark translation: content is just another ENTITY LOG `(id, recorded,
  * deleted, data)` in the registry — upserts append versions, deletes
  * append tombstones, reads are `ChangeLog` snapshots. Content therefore
  * rides every dataset facility for free: backup/restore, lineage,
  * changes-since consumption, time travel ("the config as of token T").
  * All driver-side metadata-sized operations on a metadata-sized
  * dataset. */
final class ContentStore(spark: SparkSession, registry: DatasetRegistry,
                         dataset: String = "core.content") {

  import spark.implicits._

  registry.assertDataset(dataset,
    Seq.empty[(String, Long, Boolean, String)].toDF("id", "recorded", "deleted", "data"))

  private def log: DataFrame = registry.get(dataset)

  /** Add or replace a content entry (appends a version at token `t`). */
  def upsert(id: String, data: String, t: Long): Unit =
    registry.put(dataset,
      log.unionByName(Seq((id, t, false, data)).toDF("id", "recorded", "deleted", "data")))

  /** Delete an entry (appends a tombstone — history stays queryable). */
  def delete(id: String, t: Long): Unit =
    registry.put(dataset,
      log.unionByName(Seq((id, t, true, null.asInstanceOf[String]))
        .toDF("id", "recorded", "deleted", "data")))

  /** Live entries (latest version per id, tombstones hidden). */
  def list(): DataFrame =
    ChangeLog.snapshot(log, "id", "recorded", col("deleted")).select("id", "data")

  /** One entry's current content, if live. */
  def get(id: String): Option[String] =
    list().filter(col("id") === id).collect().headOption.map(_.getString(1))

  /** The content as of an earlier token — config time travel. */
  def asOf(t: Long): DataFrame =
    ChangeLog.snapshot(log.filter(col("recorded") <= t), "id", "recorded", col("deleted"))
      .select("id", "data")
}
