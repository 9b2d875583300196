package graft.util

import org.apache.spark.sql.DataFrame

/** Registry for the intermediate frames that dedup/similarity builders
  * cache internally (signatures, shingle indexes). Those frames are
  * consumed several times inside the LAZY plan a builder returns, so the
  * builder cannot unpersist them itself — the caching contract is:
  *
  *   1. run the builder's returned plan to completion (any action);
  *   2. call [[Caches.release]] to unpersist every tracked intermediate —
  *      or, better, wrap build + action in [[Caches.scoped]], which
  *      releases exactly the frames tracked inside the block.
  *
  * `release` is TARGETED: it only unpersists frames the builders created,
  * never a caller's own persisted data (unlike
  * `spark.catalog.clearCache()`, which evicts everything in the session).
  *
  * Scoping: the bare global `release()` unpersists EVERY globally-tracked
  * frame regardless of owner, so two interleaved consumers in one JVM
  * (e.g. a Runner release firing while another builder's lazy plan is
  * still pending) would evict each other's intermediates and force full
  * recompute. `scoped { ... }` gives a consumer its own registry for the
  * duration of the block (per-thread): builders invoked inside track into
  * the scope, and only those frames are released at block exit.
  */
object Caches {

  // STRONG references, deliberately: Dataset.cache() registers the plan in
  // Spark's CacheManager, which holds it strongly until an explicit
  // unpersist — SQL-cached data is NOT reclaimed by GC/ContextCleaner when
  // the Dataset wrapper becomes unreachable. A weak registry would lose
  // the only handle that can ever unpersist the entry (the cached blocks
  // would be pinned forever); a strong one adds no leak beyond what
  // .cache() itself already created, and release() frees it.
  private type Registry = java.util.concurrent.ConcurrentLinkedQueue[DataFrame]
  private val global = new Registry()
  // builders call track() on the thread that constructs their plan, so a
  // per-thread scope stack routes their frames to the enclosing scoped{}
  private val scopes = new ThreadLocal[java.util.ArrayDeque[Registry]] {
    override def initialValue() = new java.util.ArrayDeque[Registry]()
  }

  /** Cache `df` and register it with the innermost active [[scoped]] block
    * on this thread (the global registry when none is active).
    */
  def track(df: DataFrame): DataFrame = {
    val c = df.cache()
    val stack = scopes.get()
    (if (stack.isEmpty) global else stack.peek()).add(c)
    c
  }

  /** Run `body` with its own cache registry: every frame tracked inside is
    * unpersisted when the block exits (normally or not), and frames tracked
    * by OTHER consumers are untouched. The consuming ACTION must run inside
    * the block — releasing before the action forces mid-plan recompute.
    */
  def scoped[T](body: => T): T = {
    val reg = new Registry()
    scopes.get().push(reg)
    try body
    finally {
      scopes.get().pop()
      drain(reg)
    }
  }

  /** Unpersist (non-blocking) every GLOBALLY tracked frame and clear the
    * registry. Call after the actions consuming the builders' results
    * complete — releasing earlier forces mid-plan recompute. Safe only
    * when this thread is the sole unscoped consumer (sequential harnesses:
    * Verify, Bench); concurrent consumers should use [[scoped]]. Callers
    * that never release hold cached storage exactly as a bare `.cache()`
    * would. Frames tracked inside a scoped{} block are NOT touched here.
    */
  def release(): Unit = drain(global)

  private def drain(reg: Registry): Unit = {
    var d = reg.poll()
    while (d != null) {
      d.unpersist()
      d = reg.poll()
    }
  }
}
