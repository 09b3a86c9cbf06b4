package graft.sql

import graft.SparkSpecBase

/** The raw-SQL surface of every custom Catalyst expression: each must be
  * callable BY NAME from `spark.sql(...)` text (the q26-style entry point
  * — a user who only speaks SQL gets the codegen kernels too), both via
  * `GraftFunctions.register` and via the `GraftExtensions`
  * spark.sql.extensions injector.
  */
class GraftSqlSurfaceSpec extends SparkSpecBase {

  private def sql1(q: String) = { GraftFunctions.register(spark); spark.sql(q).head() }

  test("graft_dot_f32 from raw SQL") {
    val d = sql1("""SELECT graft_dot_f32(
        CAST(array(1.0, 2.0, 3.0) AS ARRAY<FLOAT>),
        CAST(array(4.0, 5.0, 6.0) AS ARRAY<FLOAT>)) AS d""").getDouble(0)
    assert(d == 32.0)
  }

  test("graft_l2normalize_f32 from raw SQL") {
    val v = sql1("""SELECT graft_l2normalize_f32(
        CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS v""")
      .getSeq[Float](0)
    assert(v == Seq(0.6f, 0.8f))
  }

  test("graft_ivf_probe_f32 from raw SQL") {
    val probes = sql1("""SELECT graft_ivf_probe_f32(
        CAST(array(0.9, 0.1) AS ARRAY<FLOAT>),
        CAST(array(array(1.0, 0.0), array(0.0, 1.0)) AS ARRAY<ARRAY<FLOAT>>),
        2) AS p""").getSeq[Int](0)
    assert(probes == Seq(0, 1), "nearest cell first, then by distance")
  }

  test("graft_rolling_hash from raw SQL") {
    val h = sql1("SELECT graft_rolling_hash('abcabc', 3) AS h").getSeq[Long](0)
    assert(h.length == 4)
    assert(h(0) == h(3), "equal grams hash equally")
    assert(h.forall(x => x >= 0 && x < RollingHashF.Mod))
  }

  test("graft_unicode_norm from raw SQL") {
    val n = sql1("SELECT graft_unicode_norm('café', 'NFC') AS n").getString(0)
    assert(n == "café")
  }

  test("graft_minhash_sig from raw SQL") {
    val s = sql1("SELECT graft_minhash_sig(array('a b c', 'b c d'), 4) AS s")
      .getSeq[Long](0)
    assert(s.length == 4 && s.forall(_ >= 0))
  }

  test("graft_maxabs_f32 / graft_int8_codes from raw SQL") {
    val r = sql1("""SELECT
        graft_maxabs_f32(CAST(array(2.0, -4.0) AS ARRAY<FLOAT>)) AS m,
        graft_int8_codes(CAST(array(2.0, -4.0) AS ARRAY<FLOAT>)) AS c""")
    assert(r.getDouble(0) == 4.0 && r.getSeq[Int](1) == Seq(64, -127))
  }

  test("every registered name is catalog-visible after register()") {
    val s2 = spark.newSession()
    GraftFunctions.register(s2)
    Seq(GraftFunctions.DotName, GraftFunctions.L2NormName,
      GraftFunctions.IvfProbeName, GraftFunctions.RollingHashName,
      GraftFunctions.UnicodeNormName, GraftFunctions.MinhashSigName,
      GraftFunctions.MaxAbsName, GraftFunctions.Int8CodesName).foreach { n =>
      assert(s2.catalog.functionExists(n), s"$n must be SQL-visible")
    }
  }

  test("the GraftExtensions injector accepts a fresh SparkSessionExtensions") {
    // the builder-time path (spark.sql.extensions=graft.sql.GraftExtensions);
    // injection into a live shared test session isn't possible, so assert
    // the injector itself runs cleanly over a fresh extensions object
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext) // must not throw: all six inject
  }
}
