package graft.util

/** Plan-decision diagnostics: operators that pick a physical strategy at
  * runtime (broadcast vs shuffle-hash vs sort-merge payload fetches,
  * driver union-find vs distributed label propagation) record the choice
  * here so benchmarks and scale-stress runs can report WHICH path a
  * measurement exercised. Without it, two runs of "the same" bench can
  * silently measure different plans and their numbers stop being
  * comparable (round 3 shipped a 10x paragraph-dedup throughput gap that
  * could not be attributed because the chosen rebuild path wasn't named
  * anywhere in the output).
  *
  * Process-wide, last-write-wins per key; the harness clears it between
  * measured runs. Diagnostics only — no operator reads these values back.
  */
object Diag {
  private val m = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def put(key: String, value: Any): Unit = { m.put(key, value.toString); () }

  def snapshot(): Map[String, String] = {
    val b = Map.newBuilder[String, String]
    val it = m.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
    b.result()
  }

  def clear(): Unit = m.clear()
}
