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
  *
  * Reliability: each query runs SPARK_GRAFT_BENCH_REPS times (default 3) and
  * the reported number is the median — a single local[32] process running
  * ~90 queries back-to-back sees 2-5x per-query jitter from JIT/GC/page-cache
  * crowding (round-3/4 cross-round deltas on byte-identical code proved the
  * single-shot numbers untrustworthy). The complete result, including every
  * rep, is also written to target/bench_full.json so downstream tooling never
  * depends on a possibly-truncated stdout tail. Run exclusively: any
  * concurrent sbt/duckdb job on the box inflates timings 20-60%.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
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
    val all = (SparkEntry.queries -- SparkEntry.benchSkip) ++ SparkEntry.benchOnly
    // (name, median, reps) — median over successful reps; a query whose every
    // rep fails reports the negated first-rep wall time like before.
    val results: Seq[(String, Double, Seq[Double])] =
      all.toSeq.sortBy(_._1).map { case (name, fn) =>
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          val ok =
            try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
            catch { case e: Throwable =>
              if (!errors.contains(name))
                errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
              false
            }
          val dt = (System.nanoTime() - t0) / 1e9
          if (ok) dt else -dt
        }
        val good = times.filter(_ > 0).sorted
        val median =
          if (good.isEmpty) times.head
          else good(good.size / 2)
        (name, median, times)
      }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = results.map { case (k, v, _) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val total = results.collect { case (_, v, _) if v > 0 => v }.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir","reps":$reps}"""
    val repsJson = results.map { case (k, _, ts) =>
      jstr(k) + ":" + ts.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"rep_times":$repsJson,"errors":$errJson,"sf":"$sfDir","reps":$reps,"cpus":$cpus}"""
    try {
      val out = java.nio.file.Paths.get("target", "bench_full.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out, full.getBytes("UTF-8"))
    } catch { case _: Throwable => () } // file dump is best-effort; stdout line is the contract
    println(line)
    spark.stop()
  }
}
