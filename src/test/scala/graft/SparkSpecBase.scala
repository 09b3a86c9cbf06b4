package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM per `sbt test` fork;
  * building a session per suite would dominate runtime). Test data comes
  * from the driver-generated fixtures (TESTDATA.md), sf0.001 by default.
  */
object SparkSpecBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.sql.GraftFunctions.register(s)
    s
  }
  val sfDir = "/root/testdata/sf0.001"
  val sfDirMid = "/root/testdata/sf0.01"
}

trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpecBase.session
  def sfDir: String = SparkSpecBase.sfDir
  def sfDirMid: String = SparkSpecBase.sfDirMid
  def tbl(name: String, dir: String = SparkSpecBase.sfDir): DataFrame =
    Tables.load(spark, dir, name)

  /** Run `body` with the given SQL confs set, restoring priors after. */
  def withSQLConf[T](pairs: (String, String)*)(body: => T): T = {
    val prior = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
