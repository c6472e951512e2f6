package graft.internal

/** Per-JVM (per-executor) memo for derived serving structures that are
  * built FROM a broadcast value but should not be rebuilt by every task
  * — the ADC lookup tables of [[graft.functions.SimilarityFunctions]]'s
  * PQ search paths: |queries| × m × codes doubles derived from the
  * broadcast raw query vectors. Building them on the driver would
  * serialize |queries| LUT constructions through one thread and ship
  * m·codes/dim times more bytes than the vectors themselves; building
  * them per TASK would repeat the work `spark.sql.shuffle.partitions`
  * times per executor. This memo builds once per executor per
  * broadcast: the first task to arrive builds under the lock (every
  * concurrent task for the same key waits — by design, so the build
  * never runs twice), later tasks read.
  *
  * Keyed by the broadcast id, which is unique per SparkContext, so a
  * re-run with new queries gets a new key and never reads a stale
  * table. Bounded LRU (access-order): an entry is ≤ the documented
  * bounded-queries budget of its parent operator, and at most
  * `MaxEntries` such structures stay resident per executor — older
  * serving structures age out when many distinct PQ calls share one
  * long-lived JVM.
  */
private[graft] object ExecutorMemo {
  private val MaxEntries = 8
  private val cache =
    new java.util.LinkedHashMap[Long, AnyRef](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Long, AnyRef]): Boolean =
        this.size() > MaxEntries
    }

  def getOrBuild[T <: AnyRef](key: Long)(build: => T): T = cache.synchronized {
    val got = cache.get(key)
    if (got != null) got.asInstanceOf[T]
    else { val v = build; cache.put(key, v); v }
  }

  /** Test hook: number of resident entries. */
  private[graft] def size: Int = cache.synchronized(cache.size())
}
