package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram language identification heuristic (extension scope): fit per-label
  * character-trigram log-probability profiles from a labeled corpus, predict
  * by max total log-likelihood. Entirely dataflow: fit = groupBy counts,
  * predict = explode → broadcast-join profiles → sum → argmax, so it scales
  * with the corpus (no driver-side model object; the profile table itself is
  * the model and can be persisted as parquet like Categorify dictionaries).
  */
object LangId {

  /** Fit: DataFrame[lang, ngram, logp] with add-one smoothing. */
  def fitProfiles(df: DataFrame, textCol: String, labelCol: String, n: Int = 3): DataFrame = {
    val grams = df.select(col(labelCol).as("lang"),
        explode(TextOps.charNgrams(col(textCol), n)).as("ngram"))
    val counts = grams.groupBy(col("lang"), col("ngram")).agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("lang")).agg(sum(col("c")).as("total"))
    counts.join(totals, Seq("lang"))
      .select(col("lang"), col("ngram"),
        log((col("c") + lit(1)).cast("double") / (col("total") + lit(1))).as("logp"))
  }

  /** Predict: adds `predicted_<labelCol>` with the argmax-likelihood label.
    * Unmatched n-grams contribute the per-language floor penalty. */
  def predict(df: DataFrame, idCol: String, textCol: String, profiles: DataFrame,
      n: Int = 3, outputCol: String = "predicted_lang"): DataFrame = {
    val floor = profiles.groupBy(col("lang"))
      .agg(min(col("logp")).as("floor"))
    val grams = df.select(col(idCol), explode(TextOps.charNgrams(col(textCol), n)).as("ngram"))
    // Score every (doc ngram, lang) pair: cross over languages via the floor
    // table (small, broadcast), left-join the actual profile entry.
    val scored = grams
      .crossJoin(broadcast(floor))
      .join(broadcast(profiles), Seq("lang", "ngram"), "left")
      .select(col(idCol), col("lang"), coalesce(col("logp"), col("floor")).as("lp"))
    val perLang = scored.groupBy(col(idCol), col("lang")).agg(sum(col("lp")).as("score"))
    perLang.groupBy(col(idCol))
      .agg(max_by(col("lang"), struct(col("score"), col("lang"))).as(outputCol))
  }
}
