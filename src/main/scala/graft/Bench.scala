package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query (plus bench-only entries that
  * have no DuckDB-expressible oracle, e.g. ALS retrieval) against
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Measurement sinks to the `noop` datasource so the full plan materializes
  * every output column — `.count()` would let Catalyst prune unreferenced
  * projections and benchmark expression batteries as near-no-ops. Failures
  * are recorded per query (negative time + an entry in `errors`), never
  * silently summed.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed JVM warmup (JIT + codegen compiler + parquet reader init) on
    // the tiny sf0.001 flagship so the first measured query isn't charged
    // ~8 s of one-time session cost.
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // Untimed fit-once setup: materializes the artifacts the *_served
    // queries read, so their numbers isolate the serving path.
    try SparkEntry.benchSetup(spark, sfDir)
    catch { case e: Throwable =>
      errors("benchSetup") = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
    }
    val all = SparkEntry.queries ++ SparkEntry.benchOnly
    val results = all.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) dt else -dt)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = results.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v > 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
