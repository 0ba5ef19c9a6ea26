package graft

import org.apache.spark.sql.SparkSession

/** Local replica of the driver's t1 smoke: SparkEntry.entry on sf0.001
  * must return rows > 0. Usage: sbt "runMain graft.Smoke".
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build(cpus = "8", appName = "graft-smoke")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5)
    println(s"[smoke] entry rows = $n")
    assert(n > 0, "entry returned no rows")
    spark.stop()
  }
}
