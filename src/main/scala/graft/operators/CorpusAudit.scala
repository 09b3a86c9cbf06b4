package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-source corpus audits — the release-time reports that quantify how
  * a multi-source training mix overlaps with itself. Extension scope (no
  * reference counterpart; the reference is a single-source pipeline). The
  * canonical instance is Dolma/RedPajama-style dedup accounting: before
  * mixing Common Crawl + a curated source, measure how much of one is
  * already inside the other, per source PAIR, so mixture weights aren't
  * silently double-counting shared text.
  */
object CorpusAudit {

  /** Pairwise n-gram overlap matrix across groups (sources): for every
    * group pair (a < b) sharing at least one distinct gram, the distinct
    * shared-gram count, each side's distinct-gram count, and the derived
    * containment (shared / smaller side) and Jaccard similarities.
    *
    * Dataflow, corpus-size-independent by stages:
    *  1. distinct (group, gram) — the only corpus-sized shuffle, partial-
    *     aggregated, collapsing repeats BEFORE any join;
    *  2. per-group distinct counts — |groups| rows;
    *  3. self-join on gram — keyed on the gram, so a gram present in k
    *     groups yields k·(k−1)/2 pairs: bounded by |groups|², never by
    *     corpus volume. |groups| here is a source/domain-class cardinality
    *     (dozens); for unbounded grouping keys (URL hosts) cap the key
    *     space first (DataMix.capPerGroupConstant) or the pair space is
    *     quadratic in hosts-sharing-a-gram.
    *  4. per-pair counts broadcast-joined to the per-group counts.
    *
    * Similarities are each ONE IEEE division of two exact longs (correctly
    * rounded, engine-independent) — no float reductions anywhere, so every
    * column sits on the oracle hash surface. Pairs sharing nothing are not
    * emitted (the matrix is sparse).
    */
  /** Doc-level release changelog: full-outer compare of two corpus versions
    * on the id, fingerprint compared where both sides exist — the
    * row-granular companion of ShardPack.releaseDiff (that one says WHICH
    * SHARDS to re-fetch; this one says WHAT HAPPENED, per document — the
    * changelog a Dolma-style versioned release publishes). One
    * co-partitioned full-outer join on the id; emits only rows with a
    * status other than `unchanged` (at 100 TB the interesting set is the
    * delta, not the corpus — pass `keepUnchanged = true` for the audit
    * form). All columns id/string-exact. */
  def docDiff(a: DataFrame, b: DataFrame, idCol: String, fpCol: String,
      keepUnchanged: Boolean = false): DataFrame = {
    val l = a.select(col(idCol), col(fpCol).as("fp_a"))
    val r = b.select(col(idCol), col(fpCol).as("fp_b"))
    val j = l.join(r, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("fp_a").isNull, lit("added"))
          .when(col("fp_b").isNull, lit("removed"))
          .when(col("fp_a") === col("fp_b"), lit("unchanged"))
          .otherwise(lit("changed")))
    if (keepUnchanged) j else j.filter(col("status") =!= "unchanged")
  }

  def overlapMatrix(df: DataFrame, groupCol: String, grams: Column): DataFrame = {
    val sg = df.select(col(groupCol).cast("string").as("__g"),
        explode(grams).as("__gram"))
      .distinct()
    val counts = sg.groupBy(col("__g")).agg(count(lit(1)).as("__n"))
    val pairs = sg.as("a")
      .join(sg.as("b"),
        col("a.__gram") === col("b.__gram") && col("a.__g") < col("b.__g"))
      .groupBy(col("a.__g").as("source_a"), col("b.__g").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(broadcast(counts.select(col("__g").as("source_a"), col("__n").as("n_a"))),
        Seq("source_a"))
      .join(broadcast(counts.select(col("__g").as("source_b"), col("__n").as("n_b"))),
        Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_shared"),
        col("n_a"), col("n_b"),
        (col("n_shared").cast("double") / least(col("n_a"), col("n_b")))
          .as("containment"),
        (col("n_shared").cast("double")
          / (col("n_a") + col("n_b") - col("n_shared"))).as("jaccard"))
  }
}
