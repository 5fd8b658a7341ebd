package org.apache.spark.sql.graft

import org.apache.spark.sql.execution.streaming.state.{StateStore,
  StateStoreProvider, StateStoreProviderId}

/** Package bridge for the one `private[sql]` surface the replay
  * harness needs: eagerly unloading state-store providers after a
  * replay query stops. A stopped replay's providers are keyed by its
  * run-scoped (deleted) checkpoint dir and can never be reused, but
  * Spark only unloads providers lazily from the maintenance thread —
  * which, over a multi-run bench, walks an ever-growing provider map
  * doing local-FS shell forks while holding the provider-map lock
  * (measured: task threads blocked in getStateStoreProvider). */
object StateStoreBridge {

  def unloadAll(): Unit = StateStore.unloadAll()

  /** Unload only the providers rooted at `ckRoot` (round 15, r14
    * VERDICT item 9 / ADVICE item 2): unloadAll() is only safe while
    * replays are strictly sequential and no other streaming query is
    * live in the JVM — a concurrent stateful query would have its
    * providers closed mid-batch and be forced into checkpoint
    * reloads. The loaded-provider map is object-private, so the ids
    * are read via reflection (same JVM, own classpath); the unload
    * itself goes through Spark's `private[sql]`
    * removeFromLoadedProvidersAndClose, which takes the map lock.
    * Falls back to unloadAll() if the private shape ever changes. */
  def unloadForCheckpoint(ckRoot: String): Unit = {
    try {
      val f = StateStore.getClass.getDeclaredField("loadedProviders")
      f.setAccessible(true)
      val map = f.get(StateStore).asInstanceOf[
        scala.collection.mutable.HashMap[StateStoreProviderId,
          StateStoreProvider]]
      // contains, not startsWith: the provider's root is the resolved
      // "<scheme>:<ckRoot>/state" path, and ckRoot (pid + per-run qn)
      // is globally unique, so a substring match is exact
      val ids = map.synchronized {
        map.keys.filter(
          _.storeId.checkpointRootLocation.contains(ckRoot)).toList
      }
      ids.foreach(id => StateStore.removeFromLoadedProvidersAndClose(id))
    } catch {
      case _: ReflectiveOperationException | _: ClassCastException =>
        StateStore.unloadAll()
    }
  }
}
