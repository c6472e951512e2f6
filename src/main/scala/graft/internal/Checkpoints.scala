package graft.internal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Shared handling for eagerly-localCheckpoint'd stage frames.
  *
  * `Dataset.unpersist` is a no-op on a localCheckpoint'd frame (the
  * checkpoint RDD never enters the CacheManager), so the blocks must be
  * released through the RDD itself. Earlier revisions found that RDD by
  * diffing `sc.getPersistentRDDs` around the checkpoint call — racy in a
  * session running concurrent jobs on other threads: any RDD persisted in
  * between landed in the diff and was later eagerly unpersisted, evicting
  * another job's cache (and failing it outright if that frame was itself
  * checkpoint-truncated). The checkpointed RDD is not global state,
  * though: `Dataset.localCheckpoint` returns a Dataset whose analyzed
  * plan IS a [[LogicalRDD]] leaf wrapping exactly the persisted RDD, so
  * we read it from the returned frame's own plan — thread-safe by
  * construction, no registry involved.
  */
private[graft] object Checkpoints {

  /** Eagerly localCheckpoint `df`; returns the truncated frame plus a
    * release handle that unpersists exactly the checkpoint's own blocks
    * (idempotent; safe to call while other threads persist frames).
    */
  def localCheckpointTracked(df: DataFrame): (DataFrame, () => Unit) = {
    val out = df.localCheckpoint(true)
    val rdds = out.queryExecution.analyzed.collect {
      case l: LogicalRDD => l.rdd
    }
    (out, () => rdds.foreach(_.unpersist(blocking = false)))
  }
}
