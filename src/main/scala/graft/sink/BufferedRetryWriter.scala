package graft.sink

import org.apache.spark.sql.Row

/** Pluggable batch-execution seam — the analog of the reference's
  * executor/output-format split (ClickHouseExecutor vs OutputFormat), and
  * the point unit tests fake since no ClickHouse server exists offline.
  */
trait StatementExecutor extends Serializable {
  /** Execute one batch; throw to signal a retryable failure. */
  def executeBatch(rows: Seq[Row]): Unit
  def close(): Unit = ()
}

/** Count-triggered, retrying batch writer — the per-partition Spark
  * analog of the reference's hot path:
  *
  *  - buffer rows, flush when the buffer reaches batchSize
  *    (CH/table/internal/ClickHouseBatchOutputFormat.java:45-52)
  *  - retry a failed batch up to maxRetries with linear 1000*i ms
  *    backoff; the buffer is cleared ONLY on success, so rows are
  *    re-submitted after a failure — at-least-once delivery
  *    (CH/table/internal/executor/ClickHouseBatchExecutor.java:103-123)
  *  - close() flushes the remainder (ClickHouseBatchOutputFormat.java:66-79)
  *
  * The reference's time trigger (a wait/notify flusher thread waking every
  * flush-interval) is deliberately NOT a private thread here: in Spark the
  * micro-batch boundary (Trigger.ProcessingTime) supplies the time trigger,
  * and a batch partition ends with a final flush — same delivery contract,
  * one fewer thread per task (SURVEY.md §4).
  *
  * `sleeper` is injectable so tests don't actually sleep.
  */
class BufferedRetryWriter(
    executor: StatementExecutor,
    batchSize: Int,
    maxRetries: Int,
    sleeper: Long => Unit = Thread.sleep) extends Serializable {

  private val buffer = scala.collection.mutable.ArrayBuffer.empty[Row]
  private var flushes = 0L
  private var attemptsTotal = 0L

  def write(row: Row): Unit = {
    buffer += row
    if (buffer.size >= batchSize) flush()
  }

  def flush(): Unit = {
    if (buffer.isEmpty) return
    var attempt = 0
    var done = false
    while (!done) {
      attempt += 1
      attemptsTotal += 1
      try {
        executor.executeBatch(buffer.toSeq)
        buffer.clear() // only on success: failed batches are re-submitted
        done = true
        flushes += 1
      } catch {
        case e: Exception =>
          if (attempt > maxRetries)
            throw new RuntimeException(
              s"Execution of batch failed after $attempt attempts", e)
          // linear backoff, 1000*attempt ms (ClickHouseBatchExecutor.java:116)
          sleeper(1000L * attempt)
      }
    }
  }

  private var executorClosed = false

  def close(): Unit = {
    flush()
    closeWithoutFlush()
  }

  /** Release the executor WITHOUT flushing — for protocols where the
    * flush point is an explicit commit (DSv2): after a task abort, close
    * must not push the leftover buffer to the sink. Idempotent: the
    * error path may call this after close() already reached (and
    * possibly failed inside) executor.close(), and a second teardown of
    * a broken connection must not mask the original failure.
    */
  def closeWithoutFlush(): Unit =
    if (!executorClosed) {
      executorClosed = true
      executor.close()
    }

  def bufferedCount: Int = buffer.size
  def flushCount: Long = flushes
  def attemptCount: Long = attemptsTotal
}
