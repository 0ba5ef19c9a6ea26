package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Degenerate-input fixture generator (r9 verdict #6): the bug class the
  * synthetic testdata never exercises — empty tables, 1-row tables,
  * one-user/one-event-type streams, docs of 0/1/2 words, all-NULL
  * optional columns, zero vectors, singleton label classes, tied
  * timestamps — institutionalized as a generated dataset the FULL oracle
  * sweep runs over (tools/check_adversarial.py). The r8 ADVICE lows
  * (short docs, singleton label class, count-product overflow) and the
  * r8 rle_runs bug all had this shape; CORRECTNESS_adversarial is the
  * committed artifact proving the class is now swept every round.
  *
  * Two fixtures, both with schemas cloned from the real testdata so no
  * query can pass by reading a different physical type:
  *   <out>/adv       — tiny + degenerate values (the list above)
  *   <out>/adv_empty — every table present with ZERO rows
  *
  * Usage: runMain graft.AdversarialData [srcSfDir] [outDir]
  */
object AdversarialData {

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "/tmp/graft_adversarial"
    val s = GraftSession.build(cpus = "8", appName = "graft-adversarial")
    writeAdv(s, src, s"$out/adv")
    writeEmpty(s, src, s"$out/adv_empty")
    System.err.println(s"[adversarial] fixtures written under $out")
    s.stop()
  }

  def writeEmpty(s: SparkSession, src: String, dst: String): Unit =
    for (t <- Tables.all) {
      s.read.parquet(s"$src/$t.parquet").limit(0)
        .coalesce(1).write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }

  def writeAdv(s: SparkSession, src: String, dst: String): Unit = {
    def t(n: String): DataFrame = s.read.parquet(s"$src/$n.parquet")
    def write(df: DataFrame, n: String): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$dst/$n.parquet")

    // bounded dims stay real: FK targets must exist
    write(t("region"), "region")
    write(t("nation"), "nation")

    // one customer effectively duplicated (same name, same nation), one
    // zero balance — duplicate-name and zero-denominator paths
    val cust = t("customer").orderBy("c_custkey").limit(2)
    val c1 = cust.limit(1)
    val custAdv = c1.unionByName(
      c1.withColumn("c_custkey", col("c_custkey") + 1)
        .withColumn("c_acctbal", lit(0.0)))
    write(custAdv, "customer")

    write(t("supplier").orderBy("s_suppkey").limit(1), "supplier")

    val part = t("part").orderBy("p_partkey").limit(2)
    write(part, "part")

    // ONE customer owns every order, all on the SAME date, same status —
    // single-group aggregates, zero date ranges, total tie-breaking
    val ck = custAdv.orderBy("c_custkey").limit(1)
      .select("c_custkey").head().getLong(0)
    val orders = t("orders").orderBy("o_orderkey").limit(3)
      .withColumn("o_custkey", lit(ck))
      .withColumn("o_orderdate", to_timestamp(lit("2024-01-01 00:00:00")))
      .withColumn("o_orderstatus", lit("F"))
      .withColumn("o_orderpriority", lit("1-URGENT"))
    write(orders, "orders")

    // one basket: every line on the first order, alternating between the
    // two parts; quantity 0, discount 0 and 1, price 0 — the degenerate
    // arithmetic edges (zero products, 100% discount, zero quantity)
    val ok0 = orders.orderBy("o_orderkey").limit(1)
      .select("o_orderkey").head().getLong(0)
    val pks = part.orderBy("p_partkey").select("p_partkey")
      .collect().map(_.getLong(0))
    val li = t("lineitem").orderBy("l_orderkey", "l_linenumber").limit(6)
      .withColumn("l_orderkey", lit(ok0))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy("l_linenumber")))
      .withColumn("l_linenumber", col("rn").cast("int"))
      .withColumn("l_partkey",
        when(col("rn") % 2 === 0, lit(pks(0))).otherwise(lit(pks(1))))
      .withColumn("l_quantity",
        when(col("rn") === 1, lit(0.0)).otherwise(col("l_quantity")))
      .withColumn("l_discount",
        when(col("rn") === 2, lit(1.0))
          .when(col("rn") === 3, lit(0.0)).otherwise(col("l_discount")))
      .withColumn("l_extendedprice",
        when(col("rn") === 4, lit(0.0)).otherwise(col("l_extendedprice")))
      .drop("rn")
    write(li, "lineitem")

    // ONE user, ONE event type, every timestamp IDENTICAL (zero gaps,
    // total ties), value NULL on one row and 0.0 on the rest, props all
    // NULL — and because the only type is 'view', every purchase/click
    // side of every funnel/as-of/changelog query is EMPTY
    val ev = t("events").orderBy("event_id").limit(5)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("event_id")))
      .withColumn("user_id", lit(1L))
      .withColumn("event_type", lit("view"))
      .withColumn("ts", to_timestamp(lit("2024-01-01 12:00:00")))
      .withColumn("value",
        when(col("rn") === 1, lit(null).cast("double")).otherwise(lit(0.0)))
      .withColumn("props", lit(null).cast("string"))
      .drop("rn")
    write(ev, "events")

    // docs of 0/1/2 words, a whitespace-only doc, a one-word-repeated
    // doc, an EXACT duplicate pair, a NULL source — with n_chars kept
    // consistent with text (queries may rely on the invariant)
    val docSchema = t("documents").schema
    val texts = Seq(
      1L -> "",
      2L -> "word",
      3L -> "two words",
      4L -> " ",
      5L -> "dup dup dup dup dup dup dup dup",
      6L -> "identical text of the duplicate pair",
      7L -> "identical text of the duplicate pair",
      8L -> "a b")
    val docsRows = texts.map { case (id, tx) =>
      Row(id, tx, "en", if (id == 8L) null else "web", tx.length.toLong)
    }
    val docs = s.createDataFrame(
      new java.util.ArrayList[Row](docsRows.asJavaList), docSchema)
    write(docs, "documents")

    // zero vector (norm 0 — cosine division edges), two IDENTICAL unit
    // vectors (similarity exactly 1), one real vector; every label the
    // SAME (singleton class — the r8 q_class_weights bug shape)
    val dim = t("embeddings").select(size(col("embedding")))
      .head().getInt(0)
    val embSchema = t("embeddings").schema
    val zero = Array.fill(dim)(0.0f)
    val ones = Array.fill(dim)(1.0f / math.sqrt(dim.toDouble).toFloat)
    val real = t("embeddings").orderBy("vec_id").limit(1)
      .select("embedding").head().getSeq[Float](0).toArray
    val embRows = Seq(
      Row(1L, zero.toSeq, 0),
      Row(2L, ones.toSeq, 0),
      Row(3L, ones.toSeq, 0),
      Row(4L, real.toSeq, 0))
    val emb = s.createDataFrame(
      new java.util.ArrayList[Row](embRows.asJavaList), embSchema)
    write(emb, "embeddings")
  }

  private implicit class SeqOps[T](xs: Seq[T]) {
    def asJavaList: java.util.List[T] = {
      val l = new java.util.ArrayList[T](xs.size)
      xs.foreach(l.add)
      l
    }
  }
}
