package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Runs each stream transform BOTH ways — batch and incremental
  * (Trigger.AvailableNow into a memory sink, complete/append mode) — and
  * requires identical results: the unified batch/stream contract.
  */
class EventStreamsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def runStream(df: DataFrame, mode: String): DataFrame = {
    val name = s"mem_${System.nanoTime()}"
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    spark.table(name)
  }

  test("hourlyCounts: streaming result equals the batch result") {
    val batch = EventStreams.hourlyCounts(EventStreams.readEvents(spark, dir, streaming = false))
      .orderBy("window_start", "event_type").collect()
    val stream = runStream(
      EventStreams.hourlyCounts(EventStreams.readEvents(spark, dir, streaming = true)),
      "complete")
      .orderBy("window_start", "event_type").collect()
    assert(batch.length > 0)
    assert(stream.toSeq === batch.toSeq)
  }

  test("userSessions: streaming equals batch and sessions respect the gap") {
    val batch = EventStreams.userSessions(EventStreams.readEvents(spark, dir, streaming = false))
      .orderBy("session_start", "user_id").collect()
    val stream = runStream(
      EventStreams.userSessions(EventStreams.readEvents(spark, dir, streaming = true)),
      "complete")
      .orderBy("session_start", "user_id").collect()
    assert(batch.length > 0)
    assert(stream.toSeq === batch.toSeq)
    // every session is at least one event long and end > start
    batch.foreach { r =>
      assert(r.getTimestamp(1).getTime > r.getTimestamp(0).getTime)
      assert(r.getLong(3) >= 1L)
    }
  }

  test("dedupedEvents drops re-delivered event ids within the watermark") {
    val events = EventStreams.readEvents(spark, dir, streaming = true)
    val doubled = events.union(events) // simulate at-least-once redelivery
    val out = runStream(EventStreams.dedupedEvents(doubled), "append")
    val n = EventStreams.readEvents(spark, dir, streaming = false).count()
    assert(out.count() === n)
  }

  test("slidingCounts: each event lands in 4 overlapping windows") {
    val batch = EventStreams.slidingCounts(EventStreams.readEvents(spark, dir, streaming = false))
    val total = batch.agg(org.apache.spark.sql.functions.sum("n_events")).head().getLong(0)
    val n = EventStreams.readEvents(spark, dir, streaming = false).count()
    assert(total === 4 * n)
  }
}
