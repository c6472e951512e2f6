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
  * broadcast: the first task to arrive builds; concurrent tasks for the
  * SAME key wait on that key's holder (the build never runs twice),
  * while tasks for other keys proceed — the registry lock covers only
  * the map lookup, never a build, so one slow LUT construction cannot
  * stall unrelated queries sharing the JVM.
  *
  * Keyed by applicationId + broadcast id: the broadcast id alone is a
  * per-SparkContext counter, so a JVM that stops one context and
  * starts another (tests, consecutive local mains) would reuse ids and
  * serve a stale structure — the application id disambiguates. Bounded
  * LRU (access-order): an entry is ≤ the documented bounded-queries
  * budget of its parent operator, and at most `MaxEntries` such
  * structures stay resident per executor — older serving structures
  * age out when many distinct PQ calls share one long-lived JVM.
  */
private[graft] object ExecutorMemo {
  private val MaxEntries = 8

  /** One key's build slot: the lazy val carries the per-key lock, so
    * same-key waiters serialize on it and nothing else.
    */
  private final class Holder(build0: () => AnyRef) {
    lazy val value: AnyRef = build0()
  }

  private val cache =
    new java.util.LinkedHashMap[String, Holder](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Holder]): Boolean =
        this.size() > MaxEntries
    }

  def getOrBuild[T <: AnyRef](key: String)(build: => T): T = {
    val holder = cache.synchronized {
      val got = cache.get(key)
      if (got != null) got
      else { val h = new Holder(() => build); cache.put(key, h); h }
    }
    holder.value.asInstanceOf[T]
  }

  /** Test hook: number of resident entries. */
  private[graft] def size: Int = cache.synchronized(cache.size())
}
