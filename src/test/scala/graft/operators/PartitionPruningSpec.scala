package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.plans.PlanSignature

/** Partition pruning as the scan-elimination strategy (SURVEY §4 /
  * 100 TB design): data written partitioned by a low-cardinality column
  * is read back with a partition-key predicate, and the scan must touch
  * ONLY the matching directories — at scale the difference between
  * reading 1/N of 100 TB and all of it. Asserted on the scan OPERATOR
  * (partitionFilters / selectedPartitions / pushed data filters), not
  * the rendered plan string.
  */
class PartitionPruningSpec extends AnyFunSuite with SparkSuite {

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] =
    PlanSignature.nodes(p).collect { case s: FileSourceScanExec => s }

  test("partition-key predicate prunes directories; data filter is pushed") {
    val tmp = Files.createTempDirectory("graft_part")
    val dir = tmp.toFile.getAbsolutePath
    try testPruning(dir)
    finally {
      import scala.reflect.io.Directory
      new Directory(tmp.toFile).deleteRecursively()
    }
  }

  private def testPruning(dir: String): Unit = {
    val docs = graft.Tables(spark, sf0001, "documents")
    docs.write.partitionBy("lang").mode("overwrite").parquet(dir)
    val nLangs = docs.select("lang").distinct().count()
    assert(nLangs > 1) // otherwise pruning is vacuous

    val q = spark.read.parquet(dir)
      .filter(col("lang") === "en" && col("n_chars") > 100)
      .select("doc_id", "lang", "n_chars")

    val scan = scans(q.queryExecution.executedPlan) match {
      case Seq(s) => s
      case other => fail(s"expected 1 file scan, got ${other.size}")
    }
    // the lang predicate became a partition filter, not a row filter
    assert(scan.partitionFilters.exists(_.references.exists(
      _.name == "lang")), scan.partitionFilters.toString)
    // and only the one matching directory is read
    assert(scan.selectedPartitions.partitionCount == 1,
      s"read ${scan.selectedPartitions.partitionCount} of $nLangs partitions")
    // the row-level predicate reached the parquet reader
    assert(scan.dataFilters.exists(_.references.exists(
      _.name == "n_chars")), scan.dataFilters.toString)
    // column pruning: only the projected data columns are decoded
    assert(scan.requiredSchema.fieldNames.toSet == Set("doc_id", "n_chars"),
      scan.requiredSchema.treeString)

    // values survive the pruned scan
    val expected = docs.filter(col("lang") === "en" && col("n_chars") > 100)
      .count()
    assert(q.count() == expected)
  }
}
