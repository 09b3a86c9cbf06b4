package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Corpus-level exact duplicated-substring removal (the "exact substring
  * dedup" of Lee et al. 2021, *Deduplicating Training Data Makes Language
  * Models Better*, re-expressed as dataflow): every occurrence of a
  * duplicated k-token gram EXCEPT its corpus-wide first occurrence —
  * ordered by (doc, start position) — marks its k-token span for removal;
  * tokens covered by any marked span are dropped and the document is
  * rebuilt from the survivors. Unlike whole-document or line dedup this
  * catches verbatim reuse embedded mid-document (quotes, license blocks,
  * templated passages) at any alignment, and the memorization-risk spans
  * the paper targets. The suffix-array machinery of the paper is a
  * single-machine construction; the equivalent corpus-wide question —
  * "which length-≥k substrings occur more than once?" — is exactly the
  * duplicated-k-gram question, answered here with one partial-aggregated
  * shuffle. Extension scope — no reference counterpart.
  *
  * Scale design:
  *  - gram stream: `posexplode(wordShingles(toks, k))` — k× the token
  *    count, no shuffle;
  *  - first occurrence per gram: groupBy(gram).agg(min(packed id·2^21+pos))
  *    — HashAggregate with map-side combine ([[Packing]]; the LineDedup
  *    argument: a boilerplate gram in EVERY doc collapses per map
  *    partition before the exchange);
  *  - marking: grams ⋈ firsts on gram, keep occurrences with
  *    packed > first. A plain equi shuffle join: the aggregate side ships
  *    map-combined partials (tiny), the occurrence side ships the gram
  *    stream once, and the final aggregate FUSES into the join stage (one
  *    shuffle serves both). A hot gram's occurrences land on one reducer;
  *    the per-row work there is a single long comparison and nothing is
  *    sorted per group, so the reducer is linear in the hot gram's
  *    occurrence count (measured flat at 10× in ScaleExperiment's
  *    every-doc-hot-gram regime). NOTE: AQE's skew-join split does NOT
  *    apply to this shape — its pattern needs the join children to be
  *    bare shuffle reads, and the fused aggregate is between — so for a
  *    corpus where one gram's occurrences alone exceed an executor,
  *    pass `numSalts > 1`: the marking join becomes
  *    [[graft.operators.Relational.saltedJoin]], spreading each gram
  *    over `numSalts` reducers at the cost of replicating the
  *    (gram, first) table `numSalts`× (rows are two words each);
  *  - coverage: marked spans explode to ≤ k rows each — k× the
  *    duplicated-occurrence count only, not the corpus;
  *  - removal: left_anti join tokens against covered positions on
  *    (doc, pos) — anti joins tolerate duplicate right-side rows, so
  *    overlapping spans need no interval merge;
  *  - rebuild: one shuffle on doc id (collect_list + array_sort).
  * Total: three shuffles (gram, doc×pos, doc), each linear and skew-safe.
  */
object SpanDedup {

  /** (idCol, pos, gram) rows — the k-gram starting at each 0-based token
    * position; documents shorter than k contribute none. */
  private def gramRows(base: DataFrame, idCol: String, k: Int): DataFrame =
    base.select(col(idCol),
      posexplode(TextOps.wordShingles(col("__toks"), k)).as(Seq("pos", "__g")))

  /** Start positions (idCol, pos) of every duplicated-gram occurrence that
    * is NOT its gram's corpus-wide first — the spans slated for removal.
    * `numSalts > 1` salts the marking join for hot-gram skew (see the
    * scale-design note above); results are identical either way. */
  def duplicateSpanStarts(docs: DataFrame, idCol: String, toksCol: Column,
      k: Int, numSalts: Int = 1): DataFrame = {
    val base = docs.select(col(idCol), toksCol.as("__toks"))
    val grams = gramRows(base, idCol, k)
    val firsts = grams
      .groupBy(col("__g"))
      .agg(min(Packing.pack(col(idCol), col("pos"))).as("__f"))
    val marked =
      if (numSalts <= 1) grams.join(firsts, Seq("__g"))
      else graft.operators.Relational.saltedJoin(grams, firsts, Seq("__g"), numSalts)
    marked
      .filter(Packing.pack(col(idCol), col("pos")) > col("__f"))
      .select(col(idCol), col("pos"))
  }

  /** Full pipeline: drop every token covered by a duplicated span, rebuild
    * each document from the survivors (space-joined, original order).
    * Every input document survives — one whose every token was covered
    * comes back as the empty string. Output: (idCol, clean, n_kept). */
  def removeDuplicateSpans(docs: DataFrame, idCol: String, toksCol: Column,
      k: Int, numSalts: Int = 1): DataFrame = {
    val base = docs.select(col(idCol), toksCol.as("__toks"))
    val covered = duplicateSpanStarts(base, idCol, col("__toks"), k, numSalts)
      .select(col(idCol),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("pos"))
    val toks = base.select(col(idCol),
      posexplode(col("__toks")).as(Seq("pos", "__tok")))
    val rebuilt = toks.join(covered, Seq(idCol, "pos"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("pos"), col("__tok")))).as("__ts"))
      .select(col(idCol),
        concat_ws(" ", transform(col("__ts"), s => s.getField("__tok"))).as("clean"),
        size(col("__ts")).as("n_kept"))
    base.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean"), lit("")).as("clean"),
        coalesce(col("n_kept"), lit(0)).as("n_kept"))
  }
}
