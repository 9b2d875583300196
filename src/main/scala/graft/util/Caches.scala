package graft.util

import org.apache.spark.sql.DataFrame

/** Registry for the intermediate frames that dedup/similarity builders
  * cache internally (signatures, shingle indexes). Those frames are
  * consumed several times inside the LAZY plan a builder returns, so the
  * builder cannot unpersist them itself — the caching contract is:
  *
  *   1. run the builder's returned plan to completion (any action);
  *   2. call [[Caches.release]] to unpersist every tracked intermediate.
  *
  * `release` is TARGETED: it only unpersists frames the builders created,
  * never a caller's own persisted data (unlike
  * `spark.catalog.clearCache()`, which evicts everything in the session).
  */
object Caches {

  // WEAK references: a caller that never calls release() keeps the old
  // behavior — once its result (and thus the cached intermediates) becomes
  // unreachable, Spark's ContextCleaner reclaims the cached blocks as
  // before. The registry never pins a frame alive on its own.
  private val tracked =
    new java.util.concurrent.ConcurrentLinkedQueue[java.lang.ref.WeakReference[DataFrame]]()

  /** Cache `df` and register it for the next [[release]]. */
  def track(df: DataFrame): DataFrame = {
    val c = df.cache()
    tracked.add(new java.lang.ref.WeakReference(c))
    c
  }

  /** Unpersist (non-blocking) every still-reachable tracked frame and
    * clear the registry. Call after the actions consuming the builders'
    * results complete — releasing earlier forces mid-plan recompute.
    */
  def release(): Unit = {
    var ref = tracked.poll()
    while (ref != null) {
      val d = ref.get()
      if (d != null) d.unpersist()
      ref = tracked.poll()
    }
  }
}
