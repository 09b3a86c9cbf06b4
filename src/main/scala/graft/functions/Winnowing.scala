package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Packing
import graft.sql.GraftFunctions

/** Rolling-hash document fingerprinting by winnowing (Schleimer et al.
  * 2003 — the MOSS algorithm): hash every character k-gram of the
  * canonical text with a true rolling hash, slide a window of `w`
  * consecutive hashes, select each window's minimum. The selected
  * (position, hash) set is the document's fingerprint, with the guarantee
  * that any substring match of length ≥ k + w − 1 between two documents
  * shares at least one fingerprint — while storing only ~2/(w+1) of the
  * gram hashes. The local-min device makes selection position-robust:
  * unlike "every i-th hash", an insertion far away cannot shift which
  * grams are picked. Extension scope — no reference counterpart.
  *
  * The gram hash is [[graft.sql.RollingHashF]] — a codegen'd Rabin–Karp
  * pass producing ALL window hashes in O(L) per document (no per-gram
  * string materialization, no O(L·k) digesting), exact 64-bit integer
  * arithmetic that any codepoint-indexed engine replays bit-for-bit.
  *
  * Ties inside a window select the LEFTMOST minimal hash (min over the
  * packed hash·2^21+pos long — one deterministic aggregate; Schleimer's
  * rightmost rule differs only in which of two equal-hash grams is kept).
  *
  * Scale shape: the hash stream is length-linear per document and every
  * window is PARTITIONED BY document (ordered by position) — no corpus-
  * wide shuffle at all beyond the doc-keyed exchange the windows need;
  * fingerprint output is ~2·L/(w+1) rows per doc.
  */
object Winnowing {

  /** Fingerprint rows (idCol, pos, hash): the winnowed selection over
    * char k-grams of the normalized text. Documents with fewer than
    * k + w − 1 characters produce no fingerprints. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4): DataFrame = {
    require(k >= 2 && w >= 1, s"need k >= 2, w >= 1: k=$k w=$w")
    GraftFunctions.register(docs.sparkSession)
    val hashed = docs
      .select(col(idCol), TextOps.normalizeText(col(textCol)).as("__t"))
      .select(col(idCol),
        posexplode(GraftFunctions.rollingHash(col("__t"), k))
          .as(Seq("pos", "__h")))
    val byDoc = Window.partitionBy(col(idCol))
    val sliding = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    hashed
      .withColumn("__n", count(lit(1)).over(byDoc))
      .withColumn("__sel",
        min(Packing.pack(col("__h"), col("pos"))).over(sliding))
      .filter(col("pos") <= col("__n") - w) // full windows only
      .select(col(idCol),
        Packing.unpackPos(col("__sel")).as("pos"),
        Packing.unpackId(col("__sel")).as("hash"))
      .distinct()
  }
}
