package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Measurement-harness bridge: `SparkContext.listenerBus` is
  * `private[spark]`, but BenchProfile must drain it between queries so the
  * per-query job/stage/task counters are neither polluted by the warm run's
  * late async events nor truncated before the timed runs' events post
  * (ADVICE r20). Not on any query path. */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
