package graft.sink

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

object RouteSink {
  val batches =
    new ConcurrentLinkedQueue[(UpsertWriter.Route, Seq[Row])]()
  def clear(): Unit = batches.clear()
  def rowsFor(r: UpsertWriter.Route): Seq[Row] = {
    import scala.jdk.CollectionConverters._
    batches.asScala.toSeq.filter(_._1 == r).flatMap(_._2)
  }

  class Exec(route: UpsertWriter.Route) extends StatementExecutor {
    override def executeBatch(rows: Seq[Row]): Unit =
      batches.add((route, rows))
  }
}

class UpsertWriterSpec extends AnyFunSuite with SparkSuite {

  import UpsertWriter._

  private val opts = GraftSinkOptions.fromMap(Map(
    "url" -> "clickhouse://localhost:8123", "table-name" -> "t",
    "cluster-name" -> "c1", "sink.batch-size" -> "2"))

  test("statement set per route (R12 + R13)") {
    val st = statements(opts, Seq("k", "v"), Seq("k"))
    assert(st(InsertRoute) == "INSERT INTO `t`(`k`, `v`) VALUES (?, ?)")
    assert(st(UpdateRoute) ==
      "ALTER TABLE `t` ON CLUSTER `c1` UPDATE `v`=? WHERE `k`=?")
    assert(st(DeleteRoute) ==
      "ALTER TABLE `t` ON CLUSTER `c1` DELETE WHERE `k`=?")
  }

  test("rows route by kind with statement-shaped projections; -U dropped") {
    RouteSink.clear()
    import spark.implicits._
    val df = Seq((1L, "I", 10.0), (1L, "-U", 10.0), (1L, "+U", 11.0),
      (2L, "I", 20.0), (2L, "D", 20.0)).toDF("k", "op", "v")
    UpsertWriter.write(df, opts, Seq("k"), new RouteSink.Exec(_))
    // INSERT binds (k, v) — full data row, op dropped
    assert(RouteSink.rowsFor(InsertRoute)
      .map(r => (r.getLong(0), r.getDouble(1))).sorted ==
      Seq((1L, 10.0), (2L, 20.0)))
    // UPDATE binds (v, k): set columns first, then the WHERE pk
    assert(RouteSink.rowsFor(UpdateRoute)
      .map(r => (r.getDouble(0), r.getLong(1))) == Seq((11.0, 1L)))
    // DELETE binds (k) only
    assert(RouteSink.rowsFor(DeleteRoute).map(r => (r.length, r.getLong(0)))
      == Seq((1, 2L)))
    assert(RouteSink.batches.size >= 3)
  }

  test("routeFieldNames match the statements' placeholder order") {
    val fields = Seq("k", "v", "w")
    assert(UpsertWriter.routeFieldNames(InsertRoute, fields, Seq("k")) ==
      Seq("k", "v", "w"))
    assert(UpsertWriter.routeFieldNames(UpdateRoute, fields, Seq("k")) ==
      Seq("v", "w", "k")) // UPDATE `v`=?, `w`=? WHERE `k`=?
    assert(UpsertWriter.routeFieldNames(DeleteRoute, fields, Seq("k")) ==
      Seq("k"))
  }

  test("upsert requires PK and an op column") {
    import spark.implicits._
    val noOp = Seq((1L, 1.0)).toDF("k", "v")
    assertThrows[IllegalArgumentException](
      UpsertWriter.write(noOp, opts, Seq("k"), new RouteSink.Exec(_)))
    val withOp = Seq((1L, "I", 1.0)).toDF("k", "op", "v")
    assertThrows[IllegalArgumentException](
      UpsertWriter.write(withOp, opts, Nil, new RouteSink.Exec(_)))
  }
}
