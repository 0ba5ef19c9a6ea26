package graft.sink.dsv2

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** SQL UPDATE and MERGE INTO through SupportsRowLevelOperations: the
  * group-based copy-on-write rewrite reads the table, computes the
  * post-image, and the staged-replace write swaps it in at commit —
  * the scan and write share the buffered table, so staging is what
  * keeps the rewrite from consuming its own input.
  */
class Dsv2RowLevelSpec extends AnyFunSuite with SparkSuite {

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
    (1L to 10L).map(i => (i, s"name$i", i * 1.0))
      .toDF("id", "name", "score")
      .coalesce(2).writeTo(s"graft.$table").append()
  }

  test("SQL UPDATE rewrites matching rows, untouched rows survive") {
    MemorySinkRegistry.clear(); GraftCatalogRegistry.clear()
    createAndFill("t_upd")
    spark.sql("UPDATE graft.t_upd SET score = score * 10 WHERE id <= 3")
    val got = spark.table("graft.t_upd").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.size == 10)
    assert(got(1L) == 10.0 && got(2L) == 20.0 && got(3L) == 30.0)
    assert(got(4L) == 4.0 && got(10L) == 10.0)
  }

  test("UPDATE with no matches leaves the table intact") {
    MemorySinkRegistry.clear(); GraftCatalogRegistry.clear()
    createAndFill("t_upd0")
    spark.sql("UPDATE graft.t_upd0 SET name = 'x' WHERE id > 100")
    val got = spark.table("graft.t_upd0").collect()
    assert(got.length == 10)
    assert(got.forall(_.getString(1).startsWith("name")))
  }

  test("MERGE INTO: matched update + not-matched insert") {
    MemorySinkRegistry.clear(); GraftCatalogRegistry.clear()
    createAndFill("t_merge")
    import spark.implicits._
    Seq((2L, "merged2", 200.0), (11L, "fresh11", 110.0))
      .toDF("id", "name", "score")
      .createOrReplaceTempView("merge_src")
    spark.sql("""MERGE INTO graft.t_merge t USING merge_src s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET t.name = s.name, t.score = s.score
      WHEN NOT MATCHED THEN INSERT *""")
    val got = spark.table("graft.t_merge").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(got.size == 11)
    assert(got(2L) == (("merged2", 200.0)))
    assert(got(11L) == (("fresh11", 110.0)))
    assert(got(1L) == (("name1", 1.0)))
  }

  test("MERGE INTO with matched delete clause") {
    MemorySinkRegistry.clear(); GraftCatalogRegistry.clear()
    createAndFill("t_merge_del")
    import spark.implicits._
    Seq(1L, 2L, 3L).toDF("id").createOrReplaceTempView("del_src")
    spark.sql("""MERGE INTO graft.t_merge_del t USING del_src s
      ON t.id = s.id
      WHEN MATCHED THEN DELETE""")
    val ids = spark.table("graft.t_merge_del").collect()
      .map(_.getLong(0)).sorted
    assert(ids.toSeq == (4L to 10L))
  }
}
