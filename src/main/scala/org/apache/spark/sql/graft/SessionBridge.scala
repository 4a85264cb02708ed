package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic

/** Conf-scoped re-planning: rebind a frame to a CLONE of its session
  * (shared SparkContext, shared catalog, copied session state) whose
  * own RuntimeConf carries one extra setting. This is how a write can
  * run under e.g. `partitionOverwriteMode=dynamic` without mutating —
  * even transiently — the conf every other thread of the session sees
  * (`cloneSession`/`Dataset.ofRows` are `private[sql]`, hence this
  * shim lives in the sql package hierarchy like [[ColumnBridge]]).
  *
  * Clones are CACHED per (parent session, key, value): SessionState
  * initialization is ~0.5 s, far too much to pay per absorb in a
  * streaming loop (measured: p15's bench price doubled with a fresh
  * clone per call). The cache is weak-keyed on the parent so a
  * discarded session clone set is collectable. (A cached clone
  * itself references its parent, which pins the WeakHashMap entry —
  * i.e. an entry lives exactly as long as its parent session, and
  * the cache is bounded by the number of DISTINCT (key, value)
  * settings routed through it per session: one today. That is the
  * intended lifetime — the value is a session, not data.)
  * Consequence, by design: the clone snapshots the parent's OTHER
  * confs at first use — callers route writes here for the one
  * pinned setting, not for conf freshness. */
object SessionBridge {

  private val cache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[classic.SparkSession,
      scala.collection.concurrent.TrieMap[(String, String), classic.SparkSession]]())

  def withConf(df: DataFrame, key: String, value: String): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
    val clones = cache.computeIfAbsent(cs,
      _ => scala.collection.concurrent.TrieMap.empty)
    val clone = clones.getOrElseUpdate((key, value), {
      val c = cs.cloneSession()
      c.conf.set(key, value)
      c
    })
    classic.Dataset.ofRows(clone, df.asInstanceOf[classic.Dataset[Row]].queryExecution.logical)
  }
}
