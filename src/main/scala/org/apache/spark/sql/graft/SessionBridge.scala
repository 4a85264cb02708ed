package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic

/** Conf-scoped re-planning: rebind a frame to a CLONE of its session
  * (shared SparkContext, shared catalog, copied session state) whose
  * own RuntimeConf carries one extra setting. This is how a write can
  * run under e.g. `partitionOverwriteMode=dynamic` without mutating —
  * even transiently — the conf every other thread of the session sees
  * (`cloneSession`/`Dataset.ofRows` are `private[sql]`, hence this
  * shim lives in the sql package hierarchy like [[ColumnBridge]]). */
object SessionBridge {
  def withConf(df: DataFrame, key: String, value: String): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
    val clone = cs.cloneSession()
    clone.conf.set(key, value)
    classic.Dataset.ofRows(clone, df.asInstanceOf[classic.Dataset[Row]].queryExecution.logical)
  }
}
