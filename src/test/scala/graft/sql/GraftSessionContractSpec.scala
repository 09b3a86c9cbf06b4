package graft.sql

import graft.SparkSpecBase

/** The bounded-object-aggregate session contract (round-11, narrowed
  * per the round-10 advice): the ObjectHashAggregate sort-fallback raise
  * is scoped to enableBoundedObjectAgg — called only from the operator
  * paths that actually run graft's k-bounded object aggregates — so a
  * session that merely registers graft's scalar expressions keeps
  * Spark's memory-safe default for its own unbounded-buffer aggregates.
  * The raise NEVER overrides an explicit user setting (including an
  * explicit 128, which a value==default guard could not distinguish).
  */
class GraftSessionContractSpec extends SparkSpecBase {

  private val Key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"

  test("plain register leaves the fallback threshold untouched") {
    // round-10 advice: register() is called from every graft entry point,
    // so it must not change aggregate memory-safety session-wide
    val s = spark.newSession()
    assert(!s.sessionState.conf.contains(Key))
    GraftFunctions.register(s)
    assert(!s.sessionState.conf.contains(Key))
  }

  test("enableBoundedObjectAgg raises the threshold on a pristine session") {
    val s = spark.newSession()
    assert(!s.sessionState.conf.contains(Key))
    GraftFunctions.enableBoundedObjectAgg(s)
    assert(s.conf.get(Key) == (1 << 20).toString)
  }

  test("the top-k aggregate path applies the raise itself") {
    import org.apache.spark.sql.functions._
    val s = spark.newSession()
    import s.implicits._
    val df = Seq((1, 10L, 0.5), (1, 11L, 0.9)).toDF("g", "id", "score")
    graft.operators.Relational
      .topKPerGroupAgg(df, Seq("g"), col("score"), col("id"), 1).collect()
    assert(s.conf.get(Key) == (1 << 20).toString)
  }

  test("an explicit user setting always wins — even an explicit default") {
    val s = spark.newSession()
    s.conf.set(Key, "128") // deliberate: the default VALUE, set explicitly
    GraftFunctions.enableBoundedObjectAgg(s)
    assert(s.conf.get(Key) == "128")
    val s2 = spark.newSession()
    s2.conf.set(Key, "4096")
    GraftFunctions.enableBoundedObjectAgg(s2)
    assert(s2.conf.get(Key) == "4096")
  }

  test("re-enabling does not re-raise after the user lowers it") {
    val s = spark.newSession()
    GraftFunctions.enableBoundedObjectAgg(s)
    s.conf.set(Key, "256")
    GraftFunctions.enableBoundedObjectAgg(s)
    assert(s.conf.get(Key) == "256")
  }

  test("graft's object-aggregate buffers are k-bounded at the raised threshold") {
    // The contract is safe because every graft object aggregate carries a
    // BOUNDED buffer: TopKAggF's heap state is exactly k entries of
    // (double, long) no matter how many candidate rows a group sees —
    // so a 1M-group hash map is ~16B×k×groups, not candidate-sized.
    val st = new TopKState(8)
    var i = 0L
    while (i < 100000L) { st.add((i % 997).toDouble, i); i += 1 }
    assert(st.toBytes.length == 8 + 16 * 8)
    assert(st.sorted.size == 8)
  }
}
