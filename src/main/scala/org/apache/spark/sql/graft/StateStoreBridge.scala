package org.apache.spark.sql.graft

import org.apache.spark.sql.execution.streaming.state.StateStore

/** Package bridge for the one `private[sql]` call the replay harness
  * needs: eagerly unloading state-store providers after a replay
  * query stops. A stopped replay's providers are keyed by its
  * run-scoped (deleted) checkpoint dir and can never be reused, but
  * Spark only unloads providers lazily from the maintenance thread —
  * which, over a multi-run bench, walks an ever-growing provider map
  * doing local-FS shell forks while holding the provider-map lock
  * (measured: task threads blocked in getStateStoreProvider). */
object StateStoreBridge {
  def unloadAll(): Unit = StateStore.unloadAll()
}
