package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class ChangelogOpsSpec extends AnyFunSuite with SparkSuite {

  import ChangelogOps._

  private def changelog(rows: (Long, String, Double)*) = {
    import spark.implicits._
    rows.toDF("user_id", "op", "value")
  }

  test("ignoreDeletes drops D and -U (R9)") {
    val df = changelog((1L, "I", 1.0), (1L, "-U", 1.0), (1L, "+U", 2.0),
      (2L, "D", 9.0))
    assert(ignoreDeletes(df).select("op").collect().map(_.getString(0))
      .toSeq == Seq("I", "+U"))
  }

  test("collapsing sign: I/+U -> +1, -U/D -> -1 (R10)") {
    val df = changelog((1L, "I", 1.0), (1L, "-U", 1.0), (1L, "+U", 2.0),
      (1L, "D", 2.0))
    assert(withSign(df).select("sign").collect().map(_.getInt(0)).toSeq ==
      Seq(1, -1, 1, -1))
  }

  test("replacing flag: I/+U -> 0, -U/D -> 1 (R11)") {
    val df = changelog((1L, "I", 1.0), (1L, "-U", 1.0), (1L, "+U", 2.0),
      (1L, "D", 2.0))
    assert(withReplacingFlag(df).select("deleted").collect()
      .map(_.getInt(0)).toSeq == Seq(0, 1, 0, 1))
  }

  test("upsert routing: I->INSERT, +U->UPDATE, D->DELETE, -U->DROPPED (R12)") {
    val df = changelog((1L, "I", 1.0), (1L, "+U", 2.0), (1L, "D", 2.0),
      (1L, "-U", 1.0))
    assert(withUpsertRoute(df).select("route").collect()
      .map(_.getString(0)).toSeq ==
      Seq("INSERT", "UPDATE", "DELETE", "DROPPED"))
  }

  test("replacingLatest keeps highest version per key, drops tombstones") {
    import spark.implicits._
    val df = Seq(
      (1L, "I", 10L), (1L, "+U", 11L), // live, latest ver 11
      (2L, "I", 20L), (2L, "D", 21L),  // tombstoned
      (3L, "I", 30L))                   // live
      .toDF("user_id", "op", "ver")
    val got = replacingLatest(df, Seq("user_id"), "ver")
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 11L), (3L, 30L)))
  }

  test("property: net sign per key == inserts - deletes (collapsing)") {
    import spark.implicits._
    val ops = Array("I", "-U", "+U", "D")
    val rnd = new scala.util.Random(42) // deterministic property sampling
    (1 to 10).foreach { _ =>
      val rows = List.fill(60)((rnd.nextInt(5).toLong, ops(rnd.nextInt(4))))
      val df = rows.toDF("user_id", "op")
      val net = collapsingNetState(df, Seq("user_id")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = rows.groupBy(_._1).map { case (k, rs) =>
        k -> rs.map(r => if (r._2 == "I" || r._2 == "+U") 1L else -1L).sum
      }
      assert(net == expected)
    }
  }

  test("property: replacingLatest is idempotent under duplicate delivery") {
    import spark.implicits._
    // at-least-once delivery means rows may appear twice; the
    // materialized table must not change (README.md:20 rationale)
    val rows = Seq((1L, "I", 1L), (1L, "+U", 2L), (2L, "I", 3L),
      (2L, "D", 4L), (3L, "+U", 5L))
    val once = replacingLatest(rows.toDF("user_id", "op", "ver"),
      Seq("user_id"), "ver").orderBy("user_id").collect().toSeq
    val twice = replacingLatest((rows ++ rows).toDF("user_id", "op", "ver"),
      Seq("user_id"), "ver").orderBy("user_id").collect().toSeq
    assert(once == twice)
  }

  test("hash shard assignment stable and in range (R6)") {
    import spark.implicits._
    val df = Seq((5L, 7L), (5L, 7L), (3L, 1L)).toDF("a", "b")
    val shards = withHashShard(df, Seq("a", "b"), 8).select("shard")
      .collect().map(_.getLong(0))
    assert(shards(0) == shards(1)) // same keys -> same shard
    assert(shards.forall(s => s >= 0 && s < 8))
  }

  test("batch index: floor((rank-1)/batchSize) (R4)") {
    import spark.implicits._
    val df = (1L to 10L).toDF("seq")
    val idx = withBatchIndex(df, "seq", batchSize = 4)
      .orderBy("seq").select("batch_idx").collect().map(_.getLong(0)).toSeq
    assert(idx == Seq(0, 0, 0, 0, 1, 1, 1, 1, 2, 2))
  }
}
