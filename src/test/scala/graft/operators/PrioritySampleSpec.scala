package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class PrioritySampleSpec extends SparkSpecBase {
  import spark.implicits._

  /** Independent reference: same md5-dyadic u, same q = w/u, same
    * (q desc, id asc) order, same tau/w_hat — plain Scala. */
  private def reference(rows: Seq[(Long, Long)], k: Int, salt: String)
      : Seq[(Long, Long, Double, Double)] = {
    def u(id: Long): Double = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$salt|$id".getBytes("UTF-8"))
      val hex = h.map("%02x".format(_)).mkString.take(12)
      (java.lang.Long.parseLong(hex, 16) + 1).toDouble / 281474976710656.0d
    }
    val scored = rows.map { case (id, w) => (id, w, w.toDouble / u(id)) }
      .sortBy { case (id, _, q) => (-q, id) }
    val tau = if (scored.size >= k + 1) scored(k)._3 else 0.0
    scored.take(k).map { case (id, w, q) => (id, w, q, math.max(w.toDouble, tau)) }
  }

  private val fixture: Seq[(Long, Long)] =
    (1L to 50L).map(i => i -> (i * 37 % 91 + 1))

  private def run(k: Int): Seq[(Long, Long, Double, Double)] =
    PrioritySample.sample(fixture.toDF("id", "w"), "id", "w", k, "ps")
      .as[(Long, Long, Double, Double)].collect().toSeq

  test("matches the independent reference bit-for-bit (ids, priorities, tau, w_hat)") {
    for (k <- Seq(1, 5, 20))
      assert(run(k) == reference(fixture, k, "ps"), s"k=$k")
  }

  test("n <= k keeps every row with w_hat = w exactly (tau = 0)") {
    val out = run(100)
    assert(out.size == 50)
    assert(out.forall { case (_, w, _, wh) => wh == w.toDouble })
  }

  test("w_hat is bounded below by both w and tau (the DLT estimator shape)") {
    val out = run(10)
    val tauFloor = out.map(_._4).min
    assert(out.forall { case (_, w, _, wh) => wh >= w.toDouble && wh >= 0 })
    // every sampled row's estimate is >= the smallest estimate (tau for
    // light rows), and heavy rows keep their exact weight
    assert(out.forall(_._4 >= tauFloor))
  }

  test("subset-sum estimate is in the right regime (calibration sanity)") {
    // not a statistical test (the sample is deterministic): for this
    // fixture the k=20 DLT estimate of the TOTAL must land within 2x of
    // the true total — an estimator-wiring canary, catching e.g. a
    // dropped tau or a max/min mixup, which throw it off by 5-50x
    val total = fixture.map(_._2).sum.toDouble
    val est = run(20).map(_._4).sum
    assert(est > total / 2 && est < total * 2, s"est=$est total=$total")
  }

  test("deterministic across partitioning and reruns; salt changes the sample") {
    val df = fixture.toDF("id", "w")
    val a = PrioritySample.sample(df.repartition(7), "id", "w", 10, "ps")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(a == run(10))
    val b = PrioritySample.sample(df, "id", "w", 10, "other")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(b.map(_._1) != a.map(_._1))
  }

  test("the sample plan is a bounded TakeOrdered, never a full sort or window") {
    val plan = PrioritySample.sample(fixture.toDF("id", "w"), "id", "w", 10, "ps")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrdered"), s"expected bounded top-k:\n$plan")
    assert(!plan.contains("Window"), s"no window allowed:\n$plan")
  }
}
