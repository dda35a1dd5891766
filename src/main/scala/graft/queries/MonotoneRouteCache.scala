package graft.queries

/** Bounded memo of POSITIVE monotone routing verdicts — the shared
  * implementation of the kn/dsir cutover caches (they were 17-line
  * copy-twins through round 14, each with the same clear-all-on-overflow
  * nit).
  *
  * Contract: `probe` answers "has this corpus crossed the cutover?" for a
  * key that CONTAINS the corpus's data identity (the caller folds the
  * warehouse listing fingerprint in — see
  * [[graft.plans.MaterializedRollup.dataFingerprint]]), so "crossed stays
  * crossed" holds by construction: the only way a crossed corpus reads
  * uncrossed again is a content change, and a content change changes the
  * fingerprint and therefore the key. Only the positive verdict is
  * memoized — a cached "stay exact" could pin a since-grown corpus to the
  * very join the cutover exists to avoid, while below the cutover the
  * re-paid probe is the same shuffle class as the exact path it precedes.
  *
  * Eviction is LRU (access-ordered LinkedHashMap, eldest dropped past
  * `maxEntries`) — the round-14 version cleared the WHOLE set on
  * overflow, evicting hot entries alongside cold and admitting
  * maxEntries+1 first. Synchronized on the map: routing decisions are
  * driver-side and rare, contention is nil.
  */
private[graft] final class MonotoneRouteCache(maxEntries: Int = 256) {

  /** Probe invocations — the spec's observable for "memoized vs re-probed". */
  private[graft] val probes = new java.util.concurrent.atomic.AtomicLong()

  private val m = new java.util.LinkedHashMap[Any, AnyRef](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[Any, AnyRef]): Boolean =
      this.size() > maxEntries
  }

  /** True iff the cutover is crossed for `key` — from the memo when the
    * positive verdict is cached (LRU-touching the entry), else by running
    * `probe` (memoizing it only when positive).
    */
  def crossed(key: Any)(probe: => Boolean): Boolean =
    m.synchronized(m.get(key)) != null || {
      probes.incrementAndGet()
      val c = probe
      if (c) m.synchronized { m.put(key, java.lang.Boolean.TRUE); () }
      c
    }

  private[graft] def size: Int = m.synchronized(m.size())
  private[graft] def containsKey(key: Any): Boolean =
    // containsKey, not get: a read-only membership check for specs must
    // not reorder the LRU chain it is asserting about
    m.synchronized(m.containsKey(key))
}
