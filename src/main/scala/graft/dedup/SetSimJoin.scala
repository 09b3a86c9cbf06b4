package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT Jaccard set-similarity self-join by prefix filtering (the
  * AllPairs/PPJoin family — Bayardo et al. 2007, Xiao et al. 2008): all
  * pairs of documents whose token/shingle SETS have Jaccard ≥ t, with no
  * all-pairs comparison and no approximation. This completes the
  * similarity-join triangle: q34's shared-shingle all-pairs form is the
  * verification-scale EXACT baseline, MinHash-LSH (TextDedup) the
  * probabilistic scale path — this is the exact SCALE path, the one a
  * compliance-grade dedup (where a missed pair is a defect, not a recall
  * point) runs.
  *
  * The prefix-filtering principle: order every set by ONE global
  * canonical order (document frequency ASC, token ASC — rarest first);
  * if J(a,b) ≥ t then |a∩b| ≥ ⌈t/(1+t)·(|a|+|b|)⌉, and two sets with
  * that much overlap must share a token inside their first
  * |s| − ⌈t·|s|⌉ + 1 tokens (pigeonhole under the common order, using
  * the size bound t·|a| ≤ |b| ≤ |a|/t that J ≥ t forces — enforced as
  * the length filter in the candidate join). So candidates = pairs
  * sharing a PREFIX token, and the rare-first order makes prefixes hit
  * rare tokens: candidate volume tracks true-pair volume, not corpus².
  *
  * POSITIONAL filter (PPJoin proper, Xiao 2008 §3.2): a shared prefix
  * token at 1-based canonical position i in a and j in b bounds the
  * achievable overlap by 1 + min(|a|−i, |b|−j) — everything before the
  * token in either set is non-shared-so-far. The join keeps a pair only
  * when some shared prefix token's bound reaches the required minimum
  * overlap α = ⌈t/(1+t)·(|a|+|b|)⌉. Lossless: for a true pair the
  * globally FIRST common token w₁ sits inside both prefixes (it is
  * preceded only by non-common tokens, and overlap ≥ ⌈t·|s|⌉ forces its
  * position ≤ |s| − ⌈t·|s|⌉ + 1) and at w₁ the bound equals
  * 1 + min(remaining) ≥ |a∩b| ≥ α. At J ≥ 1/2 over near-dup corpora
  * this kills a large share of candidates BEFORE the array_intersect
  * verification (the expensive row-local step).
  *
  * Exactness device: the threshold is a RATIONAL num/den and every
  * filter is integer cross-multiplied (den·|∩| ≥ num·|∪|, prefix length
  * and α via integer ceil) — no float ever decides membership, so the
  * result hash-replays in any engine; the oracle (q175) deliberately
  * uses the NAIVE shared-token all-pairs formulation, so agreement
  * PROVES the prefix+positional optimization sound on real data.
  *
  * Scale: one df aggregate (map-combined), one per-doc sort (array_sort
  * over its own tokens, row-local), candidate generation = equi-join on
  * prefix tokens with the length and positional filters inline,
  * verification = one row-local array_intersect per CANDIDATE (never
  * per pair of docs). Shuffles: df agg, canonical-sort regroup,
  * candidate join, dedup — all keyed, all linear in their inputs.
  */
object SetSimJoin {

  /** All unordered pairs (id_a < id_b) with Jaccard(sets) ≥ tNum/tDen.
    * Output: (id_a, id_b, n_inter, n_union, jaccard). `toksCol` is any
    * array<string> expression; duplicates within a document are ignored
    * (set semantics). Empty sets never pair. */
  def selfJoin(docs: DataFrame, idCol: String, toksCol: Column,
      tNum: Long, tDen: Long): DataFrame = {
    require(tNum > 0 && tNum <= tDen, s"threshold must be in (0,1]: $tNum/$tDen")
    graft.sql.GraftFunctions.register(docs.sparkSession)
    // Materialize the prepared sets ONCE (eager): the plan reads base
    // from four branches (document frequencies, canonical ordering, and
    // both verification sides), and without this the tokenize/shingle
    // projection — the most expensive row-local work in the whole join —
    // re-executes per branch (measured 4×4.6 s of a 20.7 s total at
    // sf0.1; 20.7 → 7.6 s with the checkpoint). Blocks are
    // corpus-linear (the distinct-shingle arrays, MEMORY_AND_DISK) and
    // are reclaimed by the ContextCleaner once the result frame dies.
    val base = prepared(docs, idCol, toksCol).localCheckpoint()
    val cand = candidatePairs(base, tNum, tDen, positional = true)
    cand
      .join(base.select(col("__id").as("id_a"), col("__s").as("__sa"),
        col("__n").as("__na")), Seq("id_a"))
      .join(base.select(col("__id").as("id_b"), col("__s").as("__sb"),
        col("__n").as("__nb")), Seq("id_b"))
      // merge-intersect over the shared sorted order (round 16, guide §4):
      // __s is array_sort'ed once per document in `prepared`, so the
      // per-candidate count — the verification stage that dominated q175
      // after the round-15 prefix checkpoint — is a linear byte-compare
      // walk instead of ArrayIntersect's per-element hash set
      // (count-identical under the sorted-distinct precondition;
      // SortedInterCountFSpec pins it against array_intersect itself).
      .withColumn("n_inter",
        graft.sql.GraftFunctions.sortedInterCount(col("__sa"), col("__sb")))
      .withColumn("n_union", col("__na") + col("__nb") - col("n_inter"))
      .filter(lit(tDen) * col("n_inter") >= lit(tNum) * col("n_union"))
      .select(col("id_a"), col("id_b"), col("n_inter"), col("n_union"),
        (col("n_inter").cast("double") / col("n_union")).as("jaccard"))
  }

  /** (__id, __s array<string> distinct SORTED, __n size) with empties
    * dropped. The sort (round 16) costs one row-local n·log n per DOCUMENT
    * and buys the merge-intersect verification per CANDIDATE — every
    * downstream consumer is order-insensitive (explode/df-counts/the
    * canonical (df, tok) collect_list) except the verification, which
    * requires exactly this order. */
  private[graft] def prepared(docs: DataFrame, idCol: String,
      toksCol: Column): DataFrame =
    docs
      .select(col(idCol).as("__id"), array_sort(array_distinct(toksCol)).as("__s"))
      .withColumn("__n", size(col("__s")))
      .filter(col("__n") > 0)

  /** Distinct (id_a < id_b) candidate pairs from the prefix equi-join,
    * with the length filter and (when `positional`) the PPJoin
    * positional filter inline. Exposed for the spec's candidate-volume
    * assertion; `selfJoin` always runs positional. */
  private[graft] def candidatePairs(base: DataFrame, tNum: Long, tDen: Long,
      positional: Boolean): DataFrame = {
    val dfreq = base.select(explode(col("__s")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("__df"))
    // canonical rare-first order per doc, then the prefix:
    // p = n - ceil(t*n) + 1, integer ceil = (num*n + den - 1) div den
    val ordered = base.select(col("__id"), col("__n"), explode(col("__s")).as("tok"))
      .join(dfreq, Seq("tok"))
      .groupBy(col("__id"), col("__n"))
      .agg(array_sort(collect_list(struct(col("__df"), col("tok")))).as("__o"))
    val pLen = col("__n") -
      expr(s"(${tNum}L * __n + ${tDen - 1}L) div ${tDen}L") + 1
    // posexplode is 0-based over the sliced prefix, which is a prefix of
    // the full canonical order, so __p = pos + 1 is the token's 1-based
    // canonical position in the whole set
    // Materialized ONCE (round 15, guide §2.3): the candidate self-join
    // reads `pref` from BOTH sides, and without the cut the whole prefix
    // lineage — shingle explode, the dfreq join, the canonical-order
    // collect_list, the posexplode — executed once per side (the plan
    // carried two full copies; measured on q175 at sf0.1). Blocks are
    // prefix-linear (≈ half the shingle occurrences) and reclaimed by the
    // ContextCleaner when the result frame dies, the `base` precedent.
    val pref = ordered.select(col("__id"), col("__n"),
        posexplode(slice(transform(col("__o"), s => s.getField("tok")),
          lit(1), pLen)))
      .select(col("__id"), col("__n"), (col("pos") + 1).as("__p"),
        col("col").as("tok"))
      .localCheckpoint()
    val lengthFilter =
      // length filter: J >= t forces t·|a| <= |b| and t·|b| <= |a|
      lit(tNum) * col("a.__n") <= lit(tDen) * col("b.__n") &&
      lit(tNum) * col("b.__n") <= lit(tDen) * col("a.__n")
    // positional: overlap reachable from this shared token,
    // 1 + min(|a|-i, |b|-j), must cover α = ceil(num·(na+nb)/(num+den))
    val posFilter = expr(
      s"1L + least(a.__n - a.__p, b.__n - b.__p) >= " +
        s"(${tNum}L * (a.__n + b.__n) + ${tNum + tDen - 1}L) div ${tNum + tDen}L")
    val cond = col("a.tok") === col("b.tok") &&
      col("a.__id") < col("b.__id") && lengthFilter &&
      (if (positional) posFilter else lit(true))
    pref.as("a").join(pref.as("b"), cond)
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
  }
}
