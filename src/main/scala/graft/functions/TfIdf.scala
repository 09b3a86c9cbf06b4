package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TF-IDF distinctive-term extraction: the top terms of each document by
  * tf · ln(N/df) — the classic corpus-inspection / keyphrase device (what
  * does this document talk about that the corpus doesn't?). Terms present
  * in every document get idf = ln(1) = 0 and can never rank; rare terms
  * rank by their in-doc frequency.
  *
  * Dataflow: one explode → (doc, term) tf aggregation, a term-level df
  * aggregation OF THAT (vocabulary-sized, partial-aggregated), one join
  * back on term, and a per-doc WindowGroupLimit top-k — no all-pairs step,
  * no driver state; every stage is partial-aggregable so the path survives
  * an arbitrary corpus scale-up.
  *
  * Determinism: tf, df, and N are exact integers; the ln(N/df) ranking is
  * libm territory, but equal (tf, df) pairs produce EQUAL doubles within
  * each engine, so cross-engine rank flips would need two distinct
  * rational scores within one ulp — and ties break on term order. The
  * oracle-checked output carries the integers + the term; the double score
  * stays off the hash surface (q87/q122 convention).
  */
object TfIdf {

  /** Per-(doc, term) components: tf (in-doc count), df (docs containing
    * the term), n (corpus size, 1-row broadcast). */
  def termStats(docs: DataFrame, idCol: String, toks: Column): DataFrame = {
    val tf = docs.select(col(idCol), toks.as("__toks"))
      .select(col(idCol), explode(col("__toks")).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    tf.join(df, Seq("term")).crossJoin(broadcast(n))
  }

  /** Top-k distinctive terms per document, ranked by tf · ln(n/df) with
    * (term asc) tie-break. Output: idCol, rk, term, tf, df. */
  def topTermsPerDoc(docs: DataFrame, idCol: String, toks: Column,
      k: Int): DataFrame = {
    val scored = termStats(docs, idCol, toks)
      .withColumn("__score",
        col("tf") * log(col("n").cast("double") / col("df")))
    graft.operators.Relational.topKPerGroup(scored, Seq(idCol),
        Seq(col("__score").desc, col("term").asc), k)
      .select(col(idCol), col("rk"), col("term"), col("tf"), col("df"))
  }
}
