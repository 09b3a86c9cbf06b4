package graft.rank

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class AssocRulesSpec extends SparkSpecBase {
  import spark.implicits._

  // baskets: {a,b,c}, {a,b}, {a,c}, {b} → N=4, c_a=3, c_b=3, c_c=2
  private def fixture = Seq(
    (1L, "a"), (1L, "b"), (1L, "c"),
    (2L, "a"), (2L, "b"),
    (3L, "a"), (3L, "c"),
    (4L, "b")
  ).toDF("basket", "item")

  test("support / confidence / lift match the hand computation") {
    val r = AssocRules.rules(fixture, "basket", "item")
      .collect().map(x => (x.getString(0), x.getString(1)) -> x).toMap
    val ab = r(("a", "b"))
    assert(ab.getLong(2) == 2L && ab.getLong(3) == 3L && ab.getLong(4) == 3L
      && ab.getLong(5) == 4L)
    assert(ab.getDouble(6) == 2.0 / 4.0)       // support
    assert(ab.getDouble(7) == 2.0 / 3.0)       // confidence a→b
    assert(ab.getDouble(8) == 2.0 * 4.0 / 9.0) // lift
    // direction matters: b→a has confidence c_ab/c_b = 2/3 too, but c→a = 2/2
    assert(r(("c", "a")).getDouble(7) == 1.0)
    assert(r(("a", "c")).getDouble(7) == 2.0 / 3.0)
  }

  test("duplicate items in one basket count once") {
    val noisy = fixture.union(Seq((1L, "a"), (1L, "a")).toDF("basket", "item"))
    val a = AssocRules.rules(fixture, "basket", "item").collect().toSet
    val b = AssocRules.rules(noisy, "basket", "item").collect().toSet
    assert(a == b)
  }

  test("minCount prunes at the pair aggregate") {
    val r = AssocRules.rules(fixture, "basket", "item", minCount = 2L)
    assert(r.filter(col("c_pair") < 2).count() == 0)
    // b-c co-occur once only → absent
    assert(r.filter(col("ante") === "b" && col("cons") === "c").count() == 0)
  }

  test("lift > 1 iff the pair beats independence (sanity on the real fixture)") {
    val li = tbl("lineitem").select(col("l_orderkey"), col("l_partkey"))
    val r = AssocRules.rules(li, "l_orderkey", "l_partkey", minCount = 2L)
    val row = r.orderBy(col("c_pair").desc, col("ante"), col("cons")).limit(1).collect()
    if (row.nonEmpty) {
      val x = row.head
      val indep = x.getLong(3).toDouble * x.getLong(4) / x.getLong(5) / x.getLong(5)
      assert((x.getDouble(8) > 1.0) == (x.getLong(2).toDouble / x.getLong(5) > indep))
    }
  }

  test("plan: the basket repartition is shared (ReusedExchange), singletons broadcast") {
    withSQLConf("spark.sql.adaptive.enabled" -> "false") {
      val p = AssocRules.rules(fixture, "basket", "item")
        .queryExecution.executedPlan.toString
      assert(p.contains("ReusedExchange"), s"self-join must reuse the basket exchange:\n$p")
      assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
        s"singleton counts must broadcast:\n$p")
    }
  }
}
