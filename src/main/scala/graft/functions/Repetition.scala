package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repetition-based text-quality signals (the Gopher/MassiveText-style
  * filters: Rae et al. 2021, "Scaling Language Models", §A1.1): documents
  * dominated by a repeated n-gram are boilerplate/spam and get filtered
  * before pre-training. Extension scope — complements the length/diversity
  * signals in [[TextOps]] (q30) with per-doc mode statistics that need an
  * aggregation, not just a scalar expression.
  *
  * Scale notes: one explode of (doc, gram) + two partial-aggregated shuffles
  * (doc,gram → counts, then doc → max). Gram rows never carry the document
  * text; per-key state is one counter — algebraic aggregation end to end,
  * no per-doc collect.
  */
object Repetition {

  /** Per-document top-n-gram statistics over a token-array column:
    * `n_tokens`, `top_gram_count` (occurrences of the most frequent n-gram,
    * ties broken to the lexicographically LARGEST gram — struct-max order,
    * fully deterministic), `top_gram`, and `top_gram_frac` = fraction of the
    * doc's tokens covered by repeats of that gram (count·n / n_tokens — the
    * Gopher "top n-gram fraction"). Docs shorter than n tokens get count 0 /
    * frac 0.0 / null gram.
    */
  def topNgramStats(df: DataFrame, idCol: String, toks: Column, n: Int): DataFrame = {
    val sized = df.select(col(idCol), toks.as("__toks"))
      .select(col(idCol), size(col("__toks")).cast("long").as("n_tokens"), col("__toks"))
    val topGram = sized
      .select(col(idCol), explode(TextOps.wordShingles(col("__toks"), n)).as("g"))
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("c"))
      // deterministic argmax in ONE aggregation: struct order = (count, gram)
      .groupBy(col(idCol)).agg(max(struct(col("c"), col("g"))).as("__top"))
      .select(col(idCol), col("__top.c").as("top_gram_count"),
        col("__top.g").as("top_gram"))
    sized.drop("__toks")
      .join(topGram, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("top_gram_count"), lit(0L)).as("top_gram_count"),
        col("top_gram"),
        coalesce(col("top_gram_count") * n / col("n_tokens"), lit(0.0))
          .as("top_gram_frac"))
  }

  /** Duplicate-line (or paragraph/sentence — pick the separator) fraction:
    * the share of lines that are repeats of an earlier line in the same
    * document. Pure column expression over a materialized line array. */
  def duplicateLineFraction(lines: Column): Column =
    when(size(lines) > 0,
      (size(lines) - size(array_distinct(lines))).cast("double") / size(lines))
      .otherwise(lit(0.0))
}
