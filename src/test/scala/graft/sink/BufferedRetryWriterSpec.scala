package graft.sink

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

class BufferedRetryWriterSpec extends AnyFunSuite {

  private class RecordingExecutor(failFirst: Int = 0) extends StatementExecutor {
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[Row]]
    var failures = 0
    override def executeBatch(rows: Seq[Row]): Unit = {
      if (failures < failFirst) {
        failures += 1
        throw new RuntimeException(s"injected failure ${failures}")
      }
      batches += rows
    }
  }

  private def row(i: Int): Row = Row(i)

  test("count trigger flushes every batchSize rows (R4)") {
    val ex = new RecordingExecutor
    val w = new BufferedRetryWriter(ex, batchSize = 3, maxRetries = 0)
    (1 to 7).foreach(i => w.write(row(i)))
    assert(ex.batches.map(_.size) == Seq(3, 3))
    assert(w.bufferedCount == 1)
    w.close() // final flush of the remainder
    assert(ex.batches.map(_.size) == Seq(3, 3, 1))
  }

  test("retry with linear backoff; buffer kept until success (R9)") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val ex = new RecordingExecutor(failFirst = 2)
    val w = new BufferedRetryWriter(ex, batchSize = 2, maxRetries = 3,
      sleeper = sleeps += _)
    w.write(row(1)); w.write(row(2))
    // two failures then success: same rows re-submitted (at-least-once)
    assert(ex.batches == Seq(Seq(row(1), row(2))))
    assert(sleeps == Seq(1000L, 2000L)) // 1000*i linear backoff
    assert(w.attemptCount == 3)
    assert(w.bufferedCount == 0)
  }

  test("gives up after maxRetries attempts") {
    val ex = new RecordingExecutor(failFirst = 100)
    val w = new BufferedRetryWriter(ex, batchSize = 1, maxRetries = 3,
      sleeper = _ => ())
    val e = intercept[RuntimeException](w.write(row(1)))
    assert(e.getMessage.contains("after 4 attempts")) // 1 try + 3 retries
  }

  test("empty close is a no-op") {
    val ex = new RecordingExecutor
    new BufferedRetryWriter(ex, 10, 3).close()
    assert(ex.batches.isEmpty)
  }

  test("closeWithoutFlush discards the buffer (DSv2 abort path)") {
    val ex = new RecordingExecutor
    val w = new BufferedRetryWriter(ex, 10, 3)
    w.write(row(1)); w.write(row(2))
    w.closeWithoutFlush()
    assert(ex.batches.isEmpty) // buffered rows of an aborted task not sent
  }

  test("urlForShard routes to local nodes in write-local mode") {
    val opts = GraftSinkOptions.fromMap(Map(
      "url" -> "jdbc:clickhouse://coord:8123/default",
      "table-name" -> "t",
      "database-name" -> "db",
      "sink.write-local" -> "true",
      "sink.write-local-nodes" -> "h1:8123,h2:8123"))
    assert(ShardTopology.urlForShard(opts, 0) == "jdbc:clickhouse://h1:8123/db")
    assert(ShardTopology.urlForShard(opts, 1) == "jdbc:clickhouse://h2:8123/db")
    assert(ShardTopology.urlForShard(opts, 2) == "jdbc:clickhouse://h1:8123/db")
    // without write-local (or without nodes): coordinator URL
    val coord = GraftSinkOptions.fromMap(Map(
      "url" -> "jdbc:clickhouse://coord:8123/default", "table-name" -> "t",
      "sink.write-local-nodes" -> "h1:8123"))
    assert(ShardTopology.urlForShard(coord, 0) ==
      "jdbc:clickhouse://coord:8123/default")
  }
}
