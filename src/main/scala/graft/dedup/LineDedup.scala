package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level exact line/paragraph deduplication (the Dolma "dedupe by
  * paragraph" stage): a line survives only at its FIRST occurrence in the
  * corpus — ordered by (doc, position) — and every later copy, including
  * repeats inside the same document, is dropped; documents are then
  * reassembled from their surviving lines. This removes boilerplate
  * (headers, navigation, license blocks) that whole-document dedup can
  * never catch. Extension scope — no reference counterpart.
  *
  * Scale design: first-occurrence selection is `groupBy(line).agg(min(
  * struct(doc, pos)))` — a partial-aggregated (map-side combined) shuffle,
  * so a boilerplate line appearing in EVERY document (the adversarial
  * regime for the window-function formulation: one executor would sort the
  * whole corpus's copies) reduces to one row per partition before the
  * exchange. The aggregate's output IS the kept set — no join back against
  * the exploded corpus. Reassembly is one more shuffle on doc id. Total:
  * two shuffles, both skew-safe, linear in corpus lines.
  */
object LineDedup {

  /** Positions are packed with doc ids into one long for the min — keep
    * them under 2^21 (2M lines per document; the guard raises otherwise). */
  val MaxPos: Long = Packing.MaxPos

  /** Drop corpus-wide duplicate lines from exploded (idCol, posCol,
    * lineCol) rows; returns (idCol, lineCol, posCol) — the surviving
    * lines only.
    *
    * The min is over `id·2^21 + pos` packed into ONE long ([[Packing]])
    * rather than min(struct(id, pos)): a struct min compiles to a
    * SortAggregate (sorts every map partition, then again after the
    * exchange — measured 2× slower than even the window formulation at 4M
    * lines), while the packed-long min stays a HashAggregate with map-side
    * combine, which is both the fast shape and the skew-safe one. */
  def firstOccurrences(lines: DataFrame, idCol: String, posCol: String,
      lineCol: String): DataFrame =
    lines
      .groupBy(col(lineCol))
      .agg(min(Packing.pack(col(idCol), col(posCol))).as("__k"))
      .select(Packing.unpackId(col("__k")).as(idCol),
        Packing.unpackPos(col("__k")).as(posCol),
        col(lineCol))

  /** First occurrences under an arbitrary dedup KEY (the CCNet line-dedup
    * form: key = `TextOps.ccnetFingerprint(line)`, so case/accent/digit/
    * spacing variants of one boilerplate line count as copies while the
    * SURVIVING occurrence keeps its original bytes). Same two-shuffle
    * skew-safe shape as [[firstOccurrences]]; the surviving line text
    * rides the aggregate as `min_by(line, packed)` — also a partial-
    * aggregable HashAggregate, and the packed order key is unique per
    * row so the pick is deterministic. Use [[firstOccurrences]] when the
    * key IS the line: it skips the extra line-valued buffer. */
  def firstOccurrencesBy(lines: DataFrame, idCol: String, posCol: String,
      lineCol: String, key: Column): DataFrame = {
    graft.sql.GraftFunctions.register(lines.sparkSession)
    val packed = Packing.pack(col(idCol), col(posCol))
    lines
      .groupBy(key.as("__fp"))
      .agg(min(packed).as("__k"), min_by(col(lineCol), packed).as(lineCol))
      .select(Packing.unpackId(col("__k")).as(idCol),
        Packing.unpackPos(col("__k")).as(posCol),
        col(lineCol))
  }

  /** Within-document first occurrences — the per-doc dedup POLICY: each
    * document independently keeps its own first copy of a line
    * (RefinedWeb's intra-document pass — terminal spam, repeated
    * boilerplate paragraphs inside ONE page), where [[firstOccurrences]]
    * is the corpus-wide policy that also kills legitimate cross-document
    * repeats. One partial-aggregated groupBy on (doc, line); skew-free by
    * construction (the hottest key is one document's own repeats). */
  def firstOccurrencesWithinDoc(lines: DataFrame, idCol: String,
      posCol: String, lineCol: String): DataFrame =
    lines.groupBy(col(idCol), col(lineCol))
      .agg(min(col(posCol)).as(posCol))

  /** [[dropDuplicateLines]] under the within-document policy: every doc
    * keeps the first copy of each of its own lines, cross-document
    * repeats untouched. */
  def dropDuplicateLinesWithinDoc(lines: DataFrame, idCol: String,
      posCol: String, lineCol: String, sep: String = "\n"): DataFrame =
    rebuild(firstOccurrencesWithinDoc(lines, idCol, posCol, lineCol),
      lines, idCol, posCol, lineCol, sep)

  /** Full pipeline: dedup lines, then rebuild each document's text from
    * its surviving lines in original order (joined by `sep`). Every input
    * document survives — one whose every line was seen earlier comes back
    * as the empty string (filter downstream if unwanted). Output:
    * (idCol, clean string, n_kept int). */
  def dropDuplicateLines(lines: DataFrame, idCol: String, posCol: String,
      lineCol: String, sep: String = "\n"): DataFrame =
    rebuild(firstOccurrences(lines, idCol, posCol, lineCol),
      lines, idCol, posCol, lineCol, sep)

  /** [[dropDuplicateLines]] under an arbitrary dedup key — the CCNet
    * normalized-line form; kept documents are rebuilt from the ORIGINAL
    * bytes of each key's first occurrence. */
  def dropDuplicateLinesBy(lines: DataFrame, idCol: String, posCol: String,
      lineCol: String, key: Column, sep: String = "\n"): DataFrame =
    rebuild(firstOccurrencesBy(lines, idCol, posCol, lineCol, key),
      lines, idCol, posCol, lineCol, sep)

  private[graft] def rebuild(kept: DataFrame, lines: DataFrame, idCol: String,
      posCol: String, lineCol: String, sep: String): DataFrame = {
    val rebuilt = kept
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col(posCol), col(lineCol)))).as("__ls"))
      .select(col(idCol),
        concat_ws(sep, transform(col("__ls"), s => s.getField(lineCol))).as("clean"),
        size(col("__ls")).as("n_kept"))
    lines.select(col(idCol)).distinct()
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean"), lit("")).as("clean"),
        coalesce(col("n_kept"), lit(0)).as("n_kept"))
  }
}
