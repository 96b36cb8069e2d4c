package graft.mergetree

/** LRU cache of decoded, (key,ts)-sorted part rows, keyed by part id.
  *
  * Parts are immutable, so an entry is valid for the part's lifetime;
  * `invalidate` drops retired parts eagerly (GC'd directories must not be
  * served from memory after a reopen reuses the id space — ids are
  * allocated monotonically per table, so in practice this is belt and
  * braces). Total size is bounded by `maxRows`; a single part larger than
  * half the budget is never cached (one giant part must not evict the
  * whole working set of small recent parts).
  *
  * All methods synchronize on the instance — callers are the driver-side
  * scan path (parallel per-part readers) and the flush path.
  */
private[graft] final class PartRowCache(maxRows: Long) {

  private val map = new java.util.LinkedHashMap[Long, Array[KVRow]](16, 0.75f, true)
  private var totalRows = 0L

  def enabled: Boolean = maxRows > 0

  /** Largest part (in rows) the cache will hold. */
  def perPartCap: Long = maxRows / 2

  def get(partId: Long): Option[Array[KVRow]] = synchronized {
    Option(map.get(partId))
  }

  def put(partId: Long, rows: Array[KVRow]): Unit = synchronized {
    if (!enabled || rows.length > perPartCap) return
    val prev = map.put(partId, rows)
    if (prev != null) totalRows -= prev.length
    totalRows += rows.length
    val it = map.entrySet().iterator()
    while (totalRows > maxRows && it.hasNext) {
      val e = it.next()
      if (e.getKey != partId) { totalRows -= e.getValue.length; it.remove() }
    }
  }

  def invalidate(partIds: Iterable[Long]): Unit = synchronized {
    partIds.foreach { id =>
      val prev = map.remove(id)
      if (prev != null) totalRows -= prev.length
    }
  }

  def cachedRowCount: Long = synchronized(totalRows)
  def cachedPartCount: Int = synchronized(map.size())
}
