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

  // STRONG references, deliberately: Dataset.cache() registers the plan in
  // Spark's CacheManager, which holds it strongly until an explicit
  // unpersist — SQL-cached data is NOT reclaimed by GC/ContextCleaner when
  // the Dataset wrapper becomes unreachable. A weak registry would lose
  // the only handle that can ever unpersist the entry (the cached blocks
  // would be pinned forever); a strong one adds no leak beyond what
  // .cache() itself already created, and release() frees it.
  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Cache `df` and register it for the next [[release]]. */
  def track(df: DataFrame): DataFrame = {
    val c = df.cache()
    tracked.add(c)
    c
  }

  /** Unpersist (non-blocking) every tracked frame and clear the registry.
    * Call after the actions consuming the builders' results complete —
    * releasing earlier forces mid-plan recompute. Callers that never call
    * release() hold cached storage exactly as a bare `.cache()` would.
    */
  def release(): Unit = {
    var d = tracked.poll()
    while (d != null) {
      d.unpersist()
      d = tracked.poll()
    }
  }
}
