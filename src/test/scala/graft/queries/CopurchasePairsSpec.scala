package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** copurchasePairs must be an EXACT MULTISET replacement for the lineitem
  * self-join edge builder — the graph queries' oracles replay the
  * self-join in DuckDB, so any multiplicity drift (e.g. around duplicate
  * (order, part) rows) would surface as a hash mismatch downstream. */
class CopurchasePairsSpec extends SparkSpecBase {
  import spark.implicits._

  private def selfJoin(li: org.apache.spark.sql.DataFrame) =
    li.as("a").join(li.as("b"),
        col("a.k") === col("b.k") && col("a.p") =!= col("b.p"))
      .select(col("a.p").as("src"), col("b.p").as("dst"))

  test("exact multiset parity with the self-join, duplicate part rows included") {
    // order 10 has part 1 TWICE: the dup pairs with 2 and 3 twice in each
    // role but never with its own copy (value inequality, both forms)
    val li = Seq((10L, 1L), (10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 5L), (20L, 6L), (30L, 7L)).toDF("k", "p")
    def multiset(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val a = multiset(selfJoin(li))
    val b = multiset(QueryHelpers.copurchasePairs(li, "k", "p"))
    assert(b == a)
    assert(a((1L, 2L)) == 2L, "the duplicated part must pair twice")
    assert(!a.contains((1L, 1L)), "same-part row pairs are filtered")
    assert(!a.keys.exists(e => e._1 == 7L || e._2 == 7L),
      "singleton baskets emit nothing")
  }

  test("one shuffle: the pair fan-out runs map-side after a single aggregate exchange") {
    val li = Seq((10L, 1L), (10L, 2L), (20L, 3L)).toDF("k", "p")
    withSQLConf("spark.sql.adaptive.enabled" -> "false") {
      val plan = QueryHelpers.copurchasePairs(li, "k", "p")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Join"), s"no join machinery expected:\n$plan")
      assert("Exchange".r.findAllIn(plan).length == 1,
        s"exactly one exchange expected:\n$plan")
    }
  }
}
