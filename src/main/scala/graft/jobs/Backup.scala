package graft.jobs

import org.apache.spark.sql.SparkSession

/** Backup/restore of a dataset registry (reference: the backup manager
  * writes the whole store to a target location and can run on a
  * schedule; DOCUMENTATION.md "Backup").
  *
  * Spark translation: one parquet directory per dataset under the
  * backup root — a distributed, partition-parallel write, restorable by
  * directory listing. At cluster scale the same code points at object
  * storage and inherits atomic-rename commit semantics from the
  * committer. */
object Backup {

  def backup(registry: DatasetRegistry, root: String): Unit =
    registry.names.foreach { n =>
      registry.get(n).write.mode("overwrite").parquet(s"$root/$n")
    }

  def restore(spark: SparkSession, root: String): DatasetRegistry = {
    val reg = new DatasetRegistry
    // Hadoop FS listing, not java.io.File: a backup root on HDFS/S3
    // would otherwise list as null and restore an EMPTY registry
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs =
      if (fs.exists(p)) fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).sorted
      else Array.empty[String]
    dirs.foreach(n => reg.put(n, spark.read.parquet(s"$root/$n")))
    reg
  }
}
