package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** BM25 keyword relevance over a token-array corpus (Robertson/Spärck
  * Jones; the Lucene-standard formulation with the +1 idf floor). The
  * text-retrieval counterpart of the embedding similarity path in
  * graft.sim — a corpus search a data pipeline runs for curation and
  * inspection (find documents about X, rank snippets for a rater queue).
  *
  * Dataflow: one explode filtered to the query terms (the filter lands
  * inside the generator, so non-query tokens never materialize), one
  * (doc, term) aggregation, a term-df aggregation of that (|terms| rows,
  * broadcast back), and the corpus stats as a 1-row cross join. No UDFs,
  * no driver state; every reduction that feeds a double is an exact
  * decimal sum, so scores are bit-identical across partitionings.
  */
object Bm25 {

  /** Per-(doc, matching-term) BM25 pieces: doc_id, term, tf, dl,
    * `idf_arg` = (N-df+0.5)/(df+0.5) + 1 (the value the log is applied
    * to — pure rational double arithmetic, cross-engine exact) and
    * `tf_factor` = tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl)). The score is
    * ln(idf_arg)·tf_factor; the ln is applied in [[termScores]] — kept
    * OUT of the oracle-checked surface because libm log implementations
    * legitimately differ in the last ulp across engines (measured: 74 of
    * 1168 fixture rows, Java StrictMath-family vs DuckDB's std::log).
    * Docs matching no term produce no rows (their score is 0). */
  def termComponents(docs: DataFrame, idCol: String, toks: Column,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    val withDl = docs.select(col(idCol), toks.as("__toks"))
      .select(col(idCol), size(col("__toks")).cast("double").as("dl"), col("__toks"))
    // corpus stats: N and avgdl's numerator as an exact decimal sum
    val stats = withDl.agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("dl").cast(DecimalType(18, 4))).cast("double").as("sdl"))
    val tf = withDl
      .select(col(idCol), col("dl"), explode(col("__toks")).as("term"))
      .filter(col("term").isin(terms.map(lit(_)): _*))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("dft"))
    // association order mirrored verbatim in the oracle SQL — see q81
    val idfArg = (col("n") - col("dft") + lit(0.5)) / (col("dft") + lit(0.5)) + lit(1.0)
    val norm = col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("dl") / (col("sdl") / col("n"))))
    tf.join(broadcast(dfT), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col(idCol), col("term"), col("tf").cast("long").as("tf"),
        col("dl").cast("long").as("dl"),
        idfArg.as("idf_arg"),
        (col("tf") * (lit(k1) + lit(1.0)) / norm).as("tf_factor"))
  }

  /** Per-(doc, matching-term) BM25 contributions: doc_id, term, tf, dl,
    * `score` = ln(idf_arg) · tf_factor. */
  def termScores(docs: DataFrame, idCol: String, toks: Column,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame =
    termComponents(docs, idCol, toks, terms, k1, b)
      .select(col(idCol), col("term"), col("tf"), col("dl"),
        (log(col("idf_arg")) * col("tf_factor")).as("score"))

  /** Top-k documents for the query: per-term contributions summed per doc
    * (each doc has ≤ |terms| rows, summed in deterministic term order via
    * a sorted array fold, not a shuffle-order SUM), ranked descending with
    * id tie-break. */
  def topK(docs: DataFrame, idCol: String, toks: Column, terms: Seq[String],
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val per = termScores(docs, idCol, toks, terms, k1, b)
    val summed = per
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("term"), col("score")))).as("__ts"))
      .select(col(idCol),
        aggregate(col("__ts"), lit(0.0), (acc, x) => acc + x.getField("score"))
          .as("score"))
    summed.orderBy(col("score").desc, col(idCol)).limit(k)
  }
}
