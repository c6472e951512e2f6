package graft.sources

import graft.output.{Clock, SystemClock}

/** Connector reliability layer (SURVEY.md §2a; reference
  * `src/logger.py:75-132` retry decorator and `src/logger.py:135-223`
  * error tracker). These are DRIVER-side concerns wrapped around
  * connector calls — never inside the Spark plan, where a retry would
  * re-run distributed work Spark already retries per-task.
  */

/** Retry with exponential backoff: up to `maxAttempts` tries, delay
  * doubling between them (reference defaults: 3 attempts, 1 s initial,
  * ×2 backoff). `sleep` is injectable so specs can assert the schedule
  * without waiting.
  */
final class RetryPolicy(
    maxAttempts: Int = 3,
    initialDelayMs: Long = 1000L,
    backoff: Double = 2.0,
    sleep: Long => Unit = Thread.sleep) {
  require(maxAttempts >= 1, s"maxAttempts must be >= 1 (got $maxAttempts)")

  /** Run `body`, retrying on any Exception; every failed attempt is
    * recorded in `tracker`. The terminal failure re-throws the last
    * exception (reference behavior: log each retry, raise after the
    * final one).
    */
  def apply[T](operation: String, tracker: Option[ErrorTracker] = None)(body: => T): T = {
    var attempt = 1
    var delay = initialDelayMs
    while (true) {
      try return body
      catch {
        case e: Exception =>
          tracker.foreach(_.record(operation, e, attempt))
          if (attempt >= maxAttempts) throw e
          sleep(delay)
          delay = (delay * backoff).toLong
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

object RetryPolicy {
  /** Single attempt, no waiting — for callers that want tracking only. */
  def none: RetryPolicy = new RetryPolicy(maxAttempts = 1)
}

/** Structured error accumulator for one pipeline run (reference
  * `ErrorTracker`, `src/logger.py:135-223`): every connector failure —
  * including retried-then-recovered ones — is recorded with operation,
  * exception type and timestamp, and summarized into the execution log
  * and the request_log `error_count` column.
  */
final class ErrorTracker(clock: Clock = SystemClock) {

  final case class TrackedError(
      operation: String, errorType: String, message: String,
      attempt: Int, at: String)

  private val buf = scala.collection.mutable.ArrayBuffer.empty[TrackedError]

  def record(operation: String, e: Throwable, attempt: Int = 1): Unit =
    synchronized {
      buf += TrackedError(operation, e.getClass.getSimpleName,
        String.valueOf(e.getMessage), attempt, graft.output.Fmt.iso(clock))
    }

  def errors: Seq[TrackedError] = synchronized(buf.toSeq)
  def errorCount: Int = synchronized(buf.size)
  def byType: Map[String, Int] =
    errors.groupBy(_.errorType).view.mapValues(_.size).toMap
  def byOperation: Map[String, Int] =
    errors.groupBy(_.operation).view.mapValues(_.size).toMap
}
