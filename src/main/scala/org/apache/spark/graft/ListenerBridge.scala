package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is private[spark]; measurement utilities
  * (BloomScale's shuffle tally) need to drain it so async
  * stage-completed events are all delivered before a tally is read. */
object ListenerBridge {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()

  /** Number of listeners registered on the shared bus — lets specs
    * assert that per-call machinery (e.g. session clones) does not
    * LEAK bus listeners over a long-running session. */
  def listenerCount(sc: SparkContext): Int = sc.listenerBus.listeners.size()
}
