package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Recovery hatch for the stop/getOrCreate race that killed the round-4
  * bench (BENCH_r04.json): a SparkContext that died mid-run (host-induced
  * executor/job failure) can remain registered as the active context even
  * though it is stopped — `SparkSession.builder.getOrCreate` then wraps the
  * corpse and throws `IllegalStateException: Cannot call methods on a
  * stopped SparkContext`, and the JVM hangs on the corpse's non-daemon
  * threads. `SparkContext.getActive` / `clearActiveContext` are
  * private[spark]; this object lives under org.apache.spark so a benchmark
  * harness that churns 20+ sessions per run can clear the stale singleton
  * and build a fresh context (same extension-point technique as
  * [[org.apache.spark.sql.graft.ColumnBridge]]).
  */
object ContextRecovery {

  /** True when a SparkContext is registered active but already stopped —
    * the exact state `getOrCreate` cannot recover from on its own. */
  def activeStopped: Boolean = SparkContext.getActive.exists(_.isStopped)

  /** Unregister a stopped-but-still-active SparkContext (no-op when the
    * active context is live or absent). Returns true when it cleared one. */
  def clearStopped(): Boolean = synchronized {
    SparkContext.getActive match {
      case Some(sc) if sc.isStopped =>
        SparkContext.clearActiveContext()
        true
      case _ => false
    }
  }
}
