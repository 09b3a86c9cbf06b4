package graft.sql

import graft.SparkSpecBase

/** The register() engine-session contract (round-10, verdict task 5 /
  * round-9 advice): raising the ObjectHashAggregate sort-fallback
  * threshold is no longer a hidden per-operator side effect — it happens
  * exactly once, at registration, and NEVER overrides an explicit user
  * setting (including an explicit 128, which the old value==default guard
  * could not distinguish).
  */
class GraftSessionContractSpec extends SparkSpecBase {

  private val Key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"

  test("register raises the fallback threshold on a pristine session") {
    val s = spark.newSession()
    assert(!s.sessionState.conf.contains(Key))
    GraftFunctions.register(s)
    assert(s.conf.get(Key) == (1 << 20).toString)
  }

  test("an explicit user setting always wins — even an explicit default") {
    val s = spark.newSession()
    s.conf.set(Key, "128") // deliberate: the default VALUE, set explicitly
    GraftFunctions.register(s)
    assert(s.conf.get(Key) == "128")
    val s2 = spark.newSession()
    s2.conf.set(Key, "4096")
    GraftFunctions.register(s2)
    assert(s2.conf.get(Key) == "4096")
  }

  test("re-registering does not re-raise after the user lowers it") {
    val s = spark.newSession()
    GraftFunctions.register(s)
    s.conf.set(Key, "256")
    GraftFunctions.register(s)
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
