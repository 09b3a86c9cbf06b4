package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpecBase {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_layout").toString

  /** Rows the parquet reader actually materialized (post row-group
    * skipping): the scan node's numOutputRows after running the query.
    * Traverses into AdaptiveSparkPlanExec so the metric is found even if a
    * concurrently-running suite flips the shared session's AQE conf (suites
    * share one SparkSession and run in parallel). */
  private def scannedRows(df: DataFrame): Long = {
    df.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan).map(_.metrics("numOutputRows").value).sum
  }

  test("range-clustered layout lets point scans skip almost all row groups") {
    withSQLConf("spark.sql.adaptive.enabled" -> "false") {
      val ev = tbl("events", sfDirMid).select(col("event_id"), col("user_id"), col("value"))
      val total = ev.count()

      val clusteredDir = s"${tmp()}/clustered"
      Layout.writeClustered(ev, clusteredDir, Seq("user_id"), maxRecordsPerFile = 500)
      val unclusteredDir = s"${tmp()}/unclustered"
      // same file granularity, but hash-shuffled: every row group spans the
      // whole user domain, so nothing can skip
      ev.repartition(20).write.mode("overwrite")
        .option("maxRecordsPerFile", 500).parquet(unclusteredDir)

      val pred = col("user_id") === 42
      val clusteredRead = scannedRows(spark.read.parquet(clusteredDir).filter(pred))
      val unclusteredRead = scannedRows(spark.read.parquet(unclusteredDir).filter(pred))

      val matching = ev.filter(pred).count()
      // a point key can straddle a row-group boundary (2 × 500-row groups =
      // exactly 10%), so the bound is 20% — still proves skipping, without
      // tripping on boundary geometry
      assert(clusteredRead <= total / 5,
        s"clustered point scan should skip >=80% of $total rows, read $clusteredRead")
      assert(clusteredRead >= matching, "skipping must never drop matching rows")
      assert(unclusteredRead > total * 9 / 10,
        s"hash-shuffled layout cannot skip (read $unclusteredRead of $total) — " +
          "this is the baseline the clustered layout beats")
      // identical results either way
      val a = spark.read.parquet(clusteredDir).filter(pred)
      val b = spark.read.parquet(unclusteredDir).filter(pred)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    }
  }

  test("compact rewrites a fragmented directory into target-sized files") {
    val ev = tbl("events", sfDirMid).select(col("event_id"), col("user_id"), col("value"))
    val fragmented = s"${tmp()}/fragmented"
    ev.repartition(64).write.mode("overwrite").parquet(fragmented)
    def parquetFiles(dir: String): Int =
      new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(fragmented) == 64)

    val compacted = s"${tmp()}/compacted"
    Layout.compact(spark, fragmented, compacted, targetFileBytes = 1L << 30)
    assert(parquetFiles(compacted) == 1, "a small table compacts to one file")
    assert(spark.read.parquet(compacted).count() == ev.count())

    // compact-and-cluster in one pass: skipping works on the result
    val reclustered = s"${tmp()}/reclustered"
    Layout.compact(spark, fragmented, reclustered, clusterCols = Seq("user_id"))
    val out = spark.read.parquet(reclustered)
    assert(out.count() == ev.count())
    assert(out.exceptAll(ev).isEmpty && ev.exceptAll(out).isEmpty)
  }
}
