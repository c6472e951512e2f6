package graft

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicBoolean

import scala.util.control.NonFatal

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Release hook for the storage blocks operators pin internally.
  *
  * Several operators persist shared lineage so a frame feeding two
  * consumers computes once (LSH shingle/signature frames, gap-fill
  * input, the interval join's purchase list). The returned result is
  * lazy, so the operator itself can never know when those blocks are
  * safe to drop — in a one-shot job the JVM exit drops them, but a
  * long-lived session accumulates one pinned copy per call.
  *
  * Two release granularities:
  *  - [[pin]] returns the frame PLUS a release closure scoped to that
  *    one pin — the right tool for a caller that knows when ITS query
  *    is consumed, and the only safe one in a concurrent session
  *    (thread A releasing thread B's in-flight pin would cost B a
  *    recompute).
  *  - [[releaseAll]] sweeps every pin registered since the last sweep —
  *    for single-tenant drivers that run queries back to back
  *    (Bench/Verify call it between queries, alongside
  *    `spark.catalog.clearCache()`).
  *
  * Frames are held strongly until released: the CacheManager keeps the
  * blocks alive regardless of whether the caller still references the
  * frame (a weak handle would let GC collect the only route to an
  * unpersist while the blocks stay pinned), so the registry must keep
  * the handle itself. Memory held per entry is the plan object, not the
  * data; it is bounded by the caller's release cadence.
  */
object Caches {

  /** One pinned frame. Release is idempotent (compare-and-set) so the
    * scoped closure and a concurrent [[releaseAll]] sweep can race
    * without double-unpersisting, and swallows per-entry failures (a
    * frame whose SparkSession was since stopped must not abort the
    * caller or strand later queue entries).
    */
  private final class Entry(val ds: Dataset[_]) {
    private val released = new AtomicBoolean(false)
    /** `fromSweep`: the [[releaseAll]] drain already poll()ed this entry
      * off the queue — skipping the O(n) `remove` scan there keeps the
      * drain O(n) total instead of O(n²) for pin-heavy sessions.
      */
    def release(fromSweep: Boolean = false): Unit =
      if (released.compareAndSet(false, true)) {
        try ds.unpersist(blocking = false)
        catch { case NonFatal(_) => () }
        if (!fromSweep) { tracked.remove(this); () }
      }
  }

  private val tracked = new ConcurrentLinkedQueue[Entry]()

  /** Persist `ds` at `level`; release via [[releaseAll]] only. Operators
    * whose caller cannot carry a handle (the frame is internal to a
    * single returned plan) use this; prefer [[pin]] where the operator
    * API can surface the closure.
    */
  private[graft] def trackedPersist[T](ds: Dataset[T], level: StorageLevel): Dataset[T] = {
    pin(ds, level)._1
  }

  /** Persist `ds` at `level` and return it with a release closure scoped
    * to exactly this pin. The closure is idempotent and never throws;
    * frames it has released are no longer touched by [[releaseAll]].
    */
  def pin[T](ds: Dataset[T], level: StorageLevel): (Dataset[T], () => Unit) = {
    ds.persist(level)
    val e = new Entry(ds)
    tracked.add(e)
    (ds, () => e.release())
  }

  /** Unpersist every operator-pinned frame registered since the last
    * sweep (minus any already released through their scoped closure).
    * Safe anytime: unpersisting a frame a result still needs only costs
    * recompute on next use. One stale entry (e.g. its session stopped)
    * cannot abort the drain.
    */
  def releaseAll(): Unit = {
    var e = tracked.poll()
    while (e != null) {
      e.release(fromSweep = true)
      e = tracked.poll()
    }
  }
}
