package graft.sql

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** DeflateLenF: semantics of the compression-ratio quality signal (no
  * DuckDB oracle exists for deflate — these assertions are the q139
  * contract). */
class DeflateLenFSpec extends SparkSpecBase {
  import spark.implicits._

  private def len(s: String): Int = {
    GraftFunctions.register(spark)
    Seq(s).toDF("t").select(GraftFunctions.deflateLen($"t")).head().getInt(0)
  }

  test("matches a direct Deflater run (interpreted and codegen paths)") {
    val s = "the quick brown fox jumps over the lazy dog " * 10
    val expected = DeflateLenF.compressedLen(s.getBytes("UTF-8"))
    assert(len(s) === expected)
    // interpreted path (eval without codegen)
    val e = DeflateLenF(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)))
    assert(e.eval(null) === expected)
  }

  test("repetitive text compresses far better than character soup") {
    val repeated = "buy cheap widgets now " * 50
    // deterministic pseudo-random soup (no RNG in tests): md5 chain
    val soup = Iterator.iterate("seed")(x =>
      java.security.MessageDigest.getInstance("MD5").digest(x.getBytes)
        .map("%02x".format(_)).mkString).drop(1).take(35).mkString
    val rRep = len(repeated).toDouble / repeated.getBytes("UTF-8").length
    val rSoup = len(soup).toDouble / soup.getBytes("UTF-8").length
    assert(rRep < 0.1, s"template spam must compress hard: $rRep")
    assert(rSoup > 0.5, s"incompressible soup must not: $rSoup")
  }

  test("null -> null, empty -> deflate floor (2), binary accepted") {
    GraftFunctions.register(spark)
    val out = Seq((1, Some("")), (2, None), (3, Some("héllo wörld"))).toDF("i", "t")
      .select($"i", GraftFunctions.deflateLen($"t").as("l")).orderBy($"i").collect()
    assert(out(0).getInt(1) === 2) // the final empty stored block
    assert(out(1).isNullAt(1))
    assert(out(2).getInt(1) > 0)
    val bin = Seq(Array[Byte](1, 2, 3, 1, 2, 3)).toDF("b")
      .select(GraftFunctions.deflateLen($"b")).head().getInt(0)
    assert(bin > 0)
  }

  test("deterministic across partitionings and repeated runs") {
    GraftFunctions.register(spark)
    val docs = tbl("documents").select($"doc_id", $"text")
    def run(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", GraftFunctions.deflateLen($"text").as("l"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(run(docs) === run(docs.repartition(7)))
  }

  test("the kernel stays inside whole-stage codegen") {
    GraftFunctions.register(spark)
    val plan = tbl("documents")
      .select(GraftFunctions.deflateLen($"text").as("l"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_deflate_len"),
      s"deflate len must stay inside the codegen'd Project:\n$plan")
  }

  test("SQL-callable after register") {
    GraftFunctions.register(spark)
    Seq("abc").toDF("t").createOrReplaceTempView("dl_t")
    assert(spark.sql("SELECT graft_deflate_len(t) FROM dl_t").head().getInt(0) > 0)
  }
}
