package graft.core

import org.apache.spark.sql.SparkSession

/** Managed-table housekeeping shared by the standing-index builders
  * (Dedup.buildShingleIndex, Ann.buildAnnIndex/buildIvfIndex). */
object Tables {

  /** Drop a managed table AND clear any leftover warehouse directory: a
    * location written by a PREVIOUS session is unknown to this catalog,
    * and `saveAsTable` then refuses the name. */
  def drop(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }
}
