package graft.sink.dsv2

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.sink.StatementFactory

/** The mutation surface: SQL DELETE FROM through SupportsDelete and
  * writeTo(...).overwrite(cond) through SupportsOverwrite — ClickHouse
  * ALTER-mutation semantics with three-valued row filtering on the
  * memory endpoint and generated ALTER ... DELETE WHERE SQL for JDBC.
  */
class Dsv2MutationSpec extends AnyFunSuite with SparkSuite {

  private def configureCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.url",
      "clickhouse://localhost:8123")
    spark.conf.set("spark.sql.catalog.graft.graft.executor", "memory")
  }

  private def createAndFill(table: String): Unit = {
    import spark.implicits._
    configureCatalog()
    spark.sql(s"CREATE TABLE graft.$table " +
      "(id BIGINT, name STRING, score DOUBLE)")
    (1L to 20L).map(i =>
        (i, if (i % 5 == 0) null else s"name$i", i * 1.5))
      .toDF("id", "name", "score")
      .coalesce(2).writeTo(s"graft.$table").append()
  }

  test("SQL DELETE FROM removes matching rows on the memory endpoint") {
    MemorySinkRegistry.clear(); GraftCatalogRegistry.clear()
    createAndFill("t_del")
    spark.sql("DELETE FROM graft.t_del WHERE id <= 10")
    val ids = spark.table("graft.t_del").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (11L to 20L))
  }

  test("DELETE honors three-valued logic: NULL rows survive an " +
      "equality condition") {
    MemorySinkRegistry.clear(); GraftCatalogRegistry.clear()
    createAndFill("t_del3v")
    // name is NULL for ids 5,10,15,20: name != 'name1' is UNKNOWN there
    spark.sql("DELETE FROM graft.t_del3v WHERE name != 'name1'")
    val ids = spark.table("graft.t_del3v").collect()
      .map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 5L, 10L, 15L, 20L))
  }

  test("DELETE with compound condition") {
    MemorySinkRegistry.clear(); GraftCatalogRegistry.clear()
    createAndFill("t_delc")
    spark.sql("DELETE FROM graft.t_delc " +
      "WHERE score > 10.0 AND name IS NOT NULL")
    val ids = spark.table("graft.t_delc").collect()
      .map(_.getLong(0)).sorted
    // score > 10.0 ⇔ id >= 7; null-name ids 10,15,20 survive
    assert(ids.toSeq == Seq(1L, 2L, 3L, 4L, 5L, 6L, 10L, 15L, 20L))
  }

  test("overwrite(cond) replaces exactly the matching region") {
    MemorySinkRegistry.clear(); GraftCatalogRegistry.clear()
    createAndFill("t_ovr")
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    Seq((100L, "fresh", 0.5)).toDF("id", "name", "score")
      .writeTo("graft.t_ovr").overwrite(col("id") > 15L)
    val rows = spark.table("graft.t_ovr").collect()
      .map(r => r.getLong(0)).sorted
    // ids 16..20 replaced by the single id=100 row; 1..15 untouched
    assert(rows.toSeq == (1L to 15L) :+ 100L)
  }

  test("full overwrite (mode overwrite) still truncates") {
    MemorySinkRegistry.clear(); GraftCatalogRegistry.clear()
    createAndFill("t_trunc")
    import spark.implicits._
    Seq((7L, "only", 1.0)).toDF("id", "name", "score")
      .write.format("clickhouse-style")
      .option("url", "clickhouse://localhost:8123")
      .option("table-name", "t_trunc")
      .option("graft.executor", "memory")
      .mode("overwrite").save()
    val rows = spark.table("graft.t_trunc").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(7L))
  }

  test("deleteWhere SQL generation for the JDBC path") {
    assert(StatementFactory.deleteWhere("t", "(`id` > 5) AND (`x` = 1)",
      None) == "ALTER TABLE `t` DELETE WHERE (`id` > 5) AND (`x` = 1)")
    assert(StatementFactory.deleteWhere("t", "`id` IS NULL",
      Some("c1")) ==
      "ALTER TABLE `t` ON CLUSTER `c1` DELETE WHERE `id` IS NULL")
  }
}
