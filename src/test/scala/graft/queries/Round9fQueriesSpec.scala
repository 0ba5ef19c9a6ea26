package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-9 Hilbert-layout batch at sf0.001
  * (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round9fQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round9fQueries.queries(name)(spark, sf0001)

  test("q_hilbert_layout: files partition rows, boxes inside the grid") {
    val rows = run("q_hilbert_layout").collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total == graft.Tables(spark, sf0001, "lineitem").count())
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3)) // min_px <= max_px
      assert(r.getLong(4) <= r.getLong(5))
      assert(r.getLong(3) < 256 && r.getLong(5) < 256)
      assert(r.getLong(2) >= 0 && r.getLong(4) >= 0)
    }
    // hilbert d for 8-bit coords is < 65536, so file_id < 64
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 64))
  }

  test("q_layout_skipping_compare: three layouts, sane skipping shape") {
    val rows = run("q_layout_skipping_compare").collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("hilbert", "linear_x", "zorder"))
    rows.foreach { r =>
      val (nf, xeq, yeq, xr) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(xeq >= 0 && xeq <= nf)
      assert(yeq >= 0 && yeq <= nf)
      assert(xr >= xeq || xr >= 0) // a 16-wide range can't touch less
    }
    // the x-sorted layout must be best for x lookups and worst for y:
    // every linear file spans all of y, so a y point touches ALL files
    val lin = rows.find(_.getString(0) == "linear_x").get
    assert(lin.getLong(3) == lin.getLong(1),
      "x-sorted layout cannot skip any file on a y predicate")
  }

  test("q_hilbert_locality: hilbert steps are tighter than morton") {
    val rows = run("q_hilbert_locality").collect()
    val h = rows.find(_.getString(0) == "hd").get
    val z = rows.find(_.getString(0) == "zd").get
    assert(h.getLong(1) == z.getLong(1)) // same cell count - 1
    // on the FULL grid hilbert's mean step is exactly 1; on the
    // occupied subset it stays far below morton's jumpy curve
    assert(h.getDouble(3) <= z.getDouble(3),
      s"hilbert mean step ${h.getDouble(3)} vs morton ${z.getDouble(3)}")
    assert(h.getDouble(3) >= 1.0)
  }

  test("hilbert8 on the full 256x256 grid is a unit-step bijection") {
    // the defining space-filling-curve property, pinned exhaustively
    import org.apache.spark.sql.functions._
    val grid = spark.range(0, 65536L).select(
      call_function("div", col("id"), lit(256L)).as("px"), (col("id") % 256L).as("sy"))
    val out = Round9fQueries.withHilbert8(grid, "px", "sy", "hd")
      .select("px", "sy", "hd")
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
      .sortBy(_._1)
    assert(out.length == 65536)
    assert(out.head._1 == 0L && out.last._1 == 65535L)
    assert(out.map(_._1).distinct.length == 65536, "bijection")
    val unit = out.sliding(2).forall {
      case Array((_, (x1, y1)), (_, (x2, y2))) =>
        math.abs(x1 - x2) + math.abs(y1 - y2) == 1
      case _ => true
    }
    assert(unit, "consecutive hilbert indices must be unit steps")
  }
}
