package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Positional inverted index + exact phrase queries — the IR leg BM25
  * doesn't cover: BM25 ranks by bag-of-words relevance, a phrase query
  * demands CONSECUTIVE positions ("slow hash batch" as written, not the
  * three words scattered). Standard positional-postings design (every
  * search engine's phrase path): postings (term, doc, pos); the phrase
  * match is an equi-join of each term's postings shifted by its offset
  * in the phrase, so a k-term phrase is k−1 joins all keyed on the same
  * (doc, base-position) pair.
  *
  * Scale: the index is one zero-shuffle posexplode projection (persist
  * it partitioned by term for pruned single-term reads); a phrase query
  * FILTERS each leg to one term before anything shuffles — postings for
  * the phrase's terms only, never the corpus — and all legs hash on the
  * same (doc, base) key. Output counts are exact longs.
  */
object PhraseIndex {

  /** The positional index: (idCol, pos, term) — one row per token. */
  def build(docs: DataFrame, idCol: String, toks: Column): DataFrame =
    docs.select(col(idCol), posexplode(toks).as(Seq("pos", "term")))

  /** Documents containing `terms` consecutively: (idCol, n_matches) with
    * one row per doc that matches at least once, n_matches = number of
    * distinct start positions. */
  def phraseQuery(index: DataFrame, idCol: String, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "empty phrase")
    val legs = terms.zipWithIndex.map { case (t, i) =>
      index.filter(col("term") === t)
        .select(col(idCol), (col("pos") - i).as("base"))
    }
    legs.reduce((a, b) => a.join(b, Seq(idCol, "base")))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_matches"))
  }
}
