package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local SparkSession for all suites (class-loader scoped). */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSuite.session
  lazy val sf0001 = "/root/testdata/sf0.001"
}

object SparkSuite {
  // same construction site as Verify/Bench/PlanContracts (GraftSession):
  // the plan a spec asserts on is the plan the harness measures
  lazy val session: SparkSession =
    GraftSession.build(cpus = "4", appName = "graft-tests")
}
