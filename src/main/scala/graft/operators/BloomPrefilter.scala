package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-prefiltered anti/semi join: filter a huge corpus against a keyed
  * blocklist/allowlist (URL blocklists, license denylists, already-ingested
  * fingerprints) without shuffling the rows that cannot possibly match.
  *
  * A plain anti join shuffles BOTH sides on the key. Here the small side is
  * collapsed to a Bloom filter (one mergeable treeAggregate — same sketch
  * family Spark's own AQE runtime filter injects for equi-joins), the big
  * side is split by a broadcast membership probe, and only the
  * maybe-matching slice (false-positive rate `fpp` of the non-matching
  * rows, plus the true matches) pays the exact join that resolves bloom
  * false positives. Results are EXACT — the sketch only routes rows.
  *
  * Sizing: the filter costs ~1.2 bytes/key at fpp=1% — fine to ~10^8 keys;
  * past that skip the prefilter and let the plain join shuffle (the
  * blocklist is no longer "small"). The big side's scan appears twice in
  * the plan (once per branch); parquet re-scan is the cheap currency at
  * 100 TB, shuffle is the expensive one.
  *
  * This is a deliberate UDF seam: Spark's `might_contain` expression is
  * optimizer-internal (InjectRuntimeFilter), not public API, and the probe
  * is one hash per row off the codegen path — noise next to the avoided
  * exchange.
  */
object BloomPrefilter {

  /** The routing key is compared AS A STRING (the bloom sketch hashes
    * strings); string-casting is only equality-preserving when both sides
    * already have the same type, so mixed-type keys (which a plain join
    * would coerce numerically: INT 1 = DOUBLE 1.0) are rejected loudly
    * instead of silently missing matches ('1' != '1.0'). */
  private def requireSameKeyType(big: DataFrame, bigKey: Column,
      small: DataFrame, smallKey: Column): Unit = {
    val bt = big.select(bigKey).schema.head.dataType
    val st = small.select(smallKey).schema.head.dataType
    require(bt == st,
      s"bloom prefilter keys must have identical types (got $bt vs $st); " +
        "cast both sides explicitly first")
  }

  /** Build the broadcast membership probe itself (the raw might-contain
    * predicate, no resolving join): true when the key MIGHT be in
    * `small`'s key set, false only when it definitely is not. Public for
    * operators that resolve false positives through their own existing
    * exact join (SpanDedup's marking join) instead of the antiJoin /
    * semiJoin wrappers below. Builds the filter EAGERLY (one treeAggregate
    * action over `small`). */
  def probe(small: DataFrame, smallKey: Column,
      expectedItems: Long, fpp: Double): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val bf = small.select(smallKey.cast("string").as("k")).na.drop("any")
      .stat.bloomFilter("k", expectedItems, fpp)
    val bbf = small.sparkSession.sparkContext.broadcast(bf)
    udf((s: String) => s != null && bbf.value.mightContainString(s))
  }

  private def mightContain(small: DataFrame, smallKey: Column,
      expectedItems: Long, fpp: Double) =
    probe(small, smallKey, expectedItems, fpp)

  /** big WHERE bigKey NOT IN (small.smallKey) — exact anti-join semantics
    * (null big keys never match, so they are kept). */
  def antiJoin(big: DataFrame, bigKey: Column, small: DataFrame, smallKey: Column,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    requireSameKeyType(big, bigKey, small, smallKey)
    val maybe = mightContain(small, smallKey, expectedItems, fpp)
    val keyed = big.withColumn("__k", bigKey.cast("string"))
    val definiteKeep = keyed.filter(!maybe(col("__k")))
    val resolved = keyed.filter(maybe(col("__k")))
      .join(small.select(smallKey.cast("string").as("__k")), Seq("__k"), "left_anti")
    definiteKeep.unionByName(resolved).drop("__k")
  }

  /** big WHERE bigKey IN (small.smallKey) — exact semi-join semantics; the
    * definite-no slice is dropped before any exchange. */
  def semiJoin(big: DataFrame, bigKey: Column, small: DataFrame, smallKey: Column,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    requireSameKeyType(big, bigKey, small, smallKey)
    val maybe = mightContain(small, smallKey, expectedItems, fpp)
    big.withColumn("__k", bigKey.cast("string"))
      .filter(maybe(col("__k")))
      .join(small.select(smallKey.cast("string").as("__k")), Seq("__k"), "left_semi")
      .drop("__k")
  }
}
