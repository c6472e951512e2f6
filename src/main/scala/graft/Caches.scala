package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Release hook for the storage blocks operators pin internally.
  *
  * Several operators persist shared lineage so a frame feeding two
  * consumers computes once (LSH shingle/signature frames, gap-fill
  * input, the interval join's purchase list). The returned result is
  * lazy, so the operator itself can never know when those blocks are
  * safe to drop — in a one-shot job the JVM exit drops them, but a
  * long-lived session accumulates one pinned copy per call. Callers
  * that run many queries per session call [[releaseAll]] between
  * logical units of work; `spark.catalog.clearCache()` remains the
  * blunt whole-session alternative (it is what Bench/Verify use).
  *
  * Frames are held strongly until released: the CacheManager keeps the
  * blocks alive regardless of whether the caller still references the
  * frame (a weak handle would let GC collect the only route to an
  * unpersist while the blocks stay pinned), so the registry must keep
  * the handle itself. Memory held per entry is the plan object, not the
  * data; it is bounded by the caller's releaseAll cadence.
  */
object Caches {
  private val tracked = new ConcurrentLinkedQueue[Dataset[_]]()

  /** Persist `ds` at `level` and register it for [[releaseAll]]. */
  private[graft] def trackedPersist[T](ds: Dataset[T], level: StorageLevel): Dataset[T] = {
    ds.persist(level)
    tracked.add(ds)
    ds
  }

  /** Unpersist every operator-pinned frame registered since the last
    * call. Only touches frames persisted through [[trackedPersist]] —
    * never another job's cache. Safe anytime: unpersisting a frame a
    * result still needs only costs recompute on next use.
    */
  def releaseAll(): Unit = {
    var ds = tracked.poll()
    while (ds != null) {
      ds.unpersist(blocking = false)
      ds = tracked.poll()
    }
  }
}
