package graft.sink

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** End-to-end write path on a local cluster with a collecting executor
  * standing in for the JDBC endpoint (the same seam the reference uses to
  * separate ClickHouseExecutor from the OutputFormat).
  */
object CollectingSink {
  // static: visible across local-mode executor threads
  val batches = new ConcurrentLinkedQueue[(Int, Seq[Row])]()
  def clear(): Unit = batches.clear()
  def all: Seq[(Int, Seq[Row])] = {
    import scala.jdk.CollectionConverters._
    batches.asScala.toSeq
  }

  class Exec(shard: Int) extends StatementExecutor {
    override def executeBatch(rows: Seq[Row]): Unit =
      batches.add((shard, rows))
  }
}

class WriterEndToEndSpec extends AnyFunSuite with SparkSuite {

  private val base = Map(
    "url" -> "clickhouse://localhost:8123", "table-name" -> "sink_t")

  private def changelog() = {
    import spark.implicits._
    Seq((1L, "I", 10.0), (1L, "-U", 10.0), (1L, "+U", 11.0),
        (2L, "I", 20.0), (2L, "D", 20.0), (3L, "I", 30.0))
      .toDF("user_id", "op", "value")
  }

  test("insert-only mode drops D/-U and writes the rest (R9)") {
    CollectingSink.clear()
    val opts = GraftSinkOptions.fromMap(base + ("sink.batch-size" -> "2"))
    // PK declared but no collapsing/replacing field -> insert-only
    // executor despite the changelog (R3 fall-through)
    ClickHouseStyleWriter.write(changelog(), opts,
      primaryKey = Seq("user_id"), numShards = 2,
      new CollectingSink.Exec(_))
    val rows = CollectingSink.all.flatMap(_._2)
    assert(rows.size == 4) // 6 - (1 delete + 1 update_before)
    assert(rows.forall(_.length == 2)) // op column dropped
  }

  test("collapsing mode appends the sign column (R10)") {
    CollectingSink.clear()
    val opts = GraftSinkOptions.fromMap(
      base + ("table.collapsing.field" -> "sign"))
    ClickHouseStyleWriter.write(changelog(), opts,
      primaryKey = Seq("user_id"), numShards = 1,
      new CollectingSink.Exec(_))
    val rows = CollectingSink.all.flatMap(_._2)
    assert(rows.size == 6) // all row kinds written
    val perUserNet = rows.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getInt(2)).sum).toMap
    assert(perUserNet == Map(1L -> 1, 2L -> 0, 3L -> 1))
  }

  test("replacing mode appends the deleted flag (R11)") {
    CollectingSink.clear()
    val opts = GraftSinkOptions.fromMap(
      base + ("table.replacing.field" -> "deleted"))
    ClickHouseStyleWriter.write(changelog(), opts,
      primaryKey = Seq("user_id"), numShards = 1,
      new CollectingSink.Exec(_))
    val rows = CollectingSink.all.flatMap(_._2)
    assert(rows.count(_.getInt(2) == 1) == 2) // the -U and the D
  }

  test("update/delete changelog without PK is rejected (R2)") {
    val opts = GraftSinkOptions.fromMap(base)
    assertThrows[IllegalStateException](
      ClickHouseStyleWriter.prepare(changelog(), opts, primaryKey = Nil)
        .count() == 0 // prepare itself throws before any action
    )
  }

  test("write-local hash sharding co-locates keys (R5/R6)") {
    CollectingSink.clear()
    import spark.implicits._
    val df = (1L to 100L).map(i => (i % 10, "I", i.toDouble))
      .toDF("user_id", "op", "value")
    val opts = GraftSinkOptions.fromMap(base ++ Map(
      "sink.write-local" -> "true",
      "sink.partition-strategy" -> "hash",
      "sink.partition-key" -> "user_id"))
    ClickHouseStyleWriter.write(df, opts, primaryKey = Seq("user_id"),
      numShards = 4, new CollectingSink.Exec(_))
    // every user_id lands on exactly one shard
    val shardsPerUser = CollectingSink.all
      .flatMap { case (shard, rows) => rows.map(r => (r.getLong(0), shard)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size)
    assert(shardsPerUser.values.forall(_ == 1))
  }

  test("batch size triggers mid-partition flushes (R4)") {
    CollectingSink.clear()
    import spark.implicits._
    val df = (1L to 50L).map(i => (i, "I", 1.0)).toDF("user_id", "op", "value")
      .coalesce(1)
    val opts = GraftSinkOptions.fromMap(base + ("sink.batch-size" -> "20"))
    ClickHouseStyleWriter.write(df, opts, primaryKey = Seq("user_id"),
      numShards = 1, new CollectingSink.Exec(_))
    assert(CollectingSink.all.map(_._2.size).sorted == Seq(10, 20, 20))
  }
}
