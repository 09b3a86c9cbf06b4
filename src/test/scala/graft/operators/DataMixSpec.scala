package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class DataMixSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = tbl("documents").select(col("doc_id"), col("lang"), col("source"))

  test("capPerGroup keeps at most cap rows per group; uncapped groups drop") {
    val caps = Seq(("en", 3L), ("de", 2L)).toDF("lang", "cap")
    val out = DataMix.capPerGroup(docs, "lang", col("doc_id"), caps)
    val byLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang.keySet == Set("en", "de"))
    assert(byLang("en") == 3L && byLang("de") == 2L)
  }

  test("selection is deterministic and partitioning-invariant") {
    val caps = Seq(("en", 5L)).toDF("lang", "cap")
    val a = DataMix.capPerGroup(docs, "lang", col("doc_id"), caps)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = DataMix.capPerGroup(docs.repartition(17), "lang", col("doc_id"), caps)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b && a.size == 5)
  }

  test("sampleToMix clamps to group supply and floors shares") {
    val total = docs.count()
    val nEn = docs.filter($"lang" === "en").count()
    // ask for 10× the corpus in 'en' → clamped to everything 'en' has
    val out = DataMix.sampleToMix(docs, "lang", col("doc_id"),
      Map("en" -> 1.0, "de" -> 0.25), totalRows = total * 10)
    val byLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang("en") == nEn)
    assert(byLang("de") == math.min((total * 10 / 4),
      docs.filter($"lang" === "de").count()))
  }

  test("sampleToMix rejects out-of-range proportions") {
    intercept[IllegalArgumentException] {
      DataMix.sampleToMix(docs, "lang", col("doc_id"), Map("en" -> 1.5), 10L)
    }
  }

  test("sampled rows are a subset of the input") {
    val out = DataMix.sampleToMix(docs, "lang", col("doc_id"),
      Map("en" -> 0.25), totalRows = 40L)
    assert(out.join(docs, Seq("doc_id"), "left_anti").count() == 0)
  }

  test("temperatureShares: alpha=0.5 upsamples small groups vs proportional") {
    val skewed = (1 to 90).map(i => (i.toLong, "big")) ++
      (91 to 100).map(i => (i.toLong, "small"))
    val df = skewed.toDF("doc_id", "lang")
    val shares = DataMix.temperatureShares(df, "lang", 0.5)
      .select($"lang", $"share").as[(String, Double)].collect().toMap
    // sqrt weighting: small share = 3/(3+sqrt(90)/..) > its 10% proportional
    assert(shares("small") > 0.1 && shares("small") < 0.5)
    assert(math.abs(shares.values.sum - 1.0) < 1e-9)
    // alpha = 1 is (quantized-)proportional
    val prop = DataMix.temperatureShares(df, "lang", 1.0)
      .select($"lang", $"share").as[(String, Double)].collect().toMap
    assert(math.abs(prop("small") - 0.1) < 1e-6)
  }

  test("temperatureShares is partitioning-invariant (exact integer total)") {
    val df = docs
    val a = DataMix.temperatureShares(df, "lang", 0.5)
      .orderBy($"lang").collect().toSeq
    val b = DataMix.temperatureShares(df.repartition(7), "lang", 0.5)
      .orderBy($"lang").collect().toSeq
    assert(a == b)
  }

  test("sampleToTemperatureMix caps each group at floor(share * total)") {
    val out = DataMix.sampleToTemperatureMix(docs, "lang", col("doc_id"),
      alpha = 0.5, totalRows = 40L)
    val shares = DataMix.temperatureShares(docs, "lang", 0.5)
      .select($"lang", $"share").as[(String, Double)].collect().toMap
    val byLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    val have = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    byLang.foreach { case (lang, n) =>
      val cap = math.floor(shares(lang) * 40).toLong
      assert(n == math.min(cap, have(lang)), s"$lang: $n vs cap $cap")
    }
  }

  test("epochPlan matches the fixed-point recurrence; cap applies; zero-token group is 0") {
    val counts = Seq(("web", 10000L), ("books", 400L), ("empty", 0L))
      .toDF("src", "n_tokens")
    val out = DataMix.epochPlan(counts, "src", alpha = 0.5,
        budgetTokens = 8000L, maxEpochsE6 = 2000000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    // independent reference: same quantized weights + double chain
    val w = Map("web" -> math.floor(math.sqrt(10000.0) * (1L << 26)).toLong,
      "books" -> math.floor(math.sqrt(400.0) * (1L << 26)).toLong,
      "empty" -> 0L)
    val tw = w.values.sum.toDouble
    def ref(k: String, n: Long) = {
      val share = w(k) / tw
      val e = if (n == 0) 0L
        else math.min(math.floor(share * 8000L / n * 1000000.0).toLong, 2000000L)
      (n, share, e, e * n / 1000000L)
    }
    assert(out("web") === ref("web", 10000L))
    assert(out("books") === ref("books", 400L))
    assert(out("empty") === ref("empty", 0L))
    // books: share*B/n = (1/6)*8000/400 = 3.33 epochs -> capped at 2.0
    assert(out("books")._3 === 2000000L)
    assert(out("web")._3 < 2000000L)
  }

  test("epochPlan: uncapped groups consume the budget within floor dust") {
    val counts = Seq(("a", 5000L), ("b", 5000L)).toDF("src", "n_tokens")
    val out = DataMix.epochPlan(counts, "src", alpha = 1.0,
        budgetTokens = 6000L, maxEpochsE6 = 100000000L)
      .collect().map(r => r.getLong(4)).sum
    // nothing capped -> planned within (budget - groups) .. budget
    assert(out <= 6000L && out >= 6000L - 2L)
  }
}
