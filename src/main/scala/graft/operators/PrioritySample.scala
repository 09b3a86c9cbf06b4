package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic weighted sampling without replacement by PRIORITY
  * SAMPLING (Duffield, Lund & Thorup 2007, "Priority sampling for
  * estimation of arbitrary subset sums"): each row draws u_i ∈ (0,1],
  * gets priority q_i = w_i/u_i, and the k highest-priority rows are the
  * sample; with τ = the (k+1)-th priority, ŵ_i = max(w_i, τ) is an
  * UNBIASED estimator of any subset sum over the original weights —
  * the device a data-recipe prototype needs to subsample a corpus by
  * token count and still report calibrated totals. Weighted sampling is
  * the size-biased companion of the uniform hashSample / stratified
  * samplers in Relational.
  *
  * Why priority sampling and not Efraimidis-Spirakis (u^(1/w) keys):
  * ES needs pow(), which no engine guarantees correctly rounded — its
  * keys can differ in the last ulp across libm implementations and
  * break hash-replay. Priority sampling's only float op is ONE IEEE
  * division (w/u, correctly rounded everywhere), and u itself is an
  * exact dyadic rational (md5-hash48 + 1) / 2^48 ∈ (0,1] — so the whole
  * sample, τ included, is bit-identical in any engine: the repo's
  * engine-replayable-hash convention applied to randomized sampling.
  *
  * Scale: priorities are a zero-shuffle projection; the sample is ONE
  * bounded TakeOrdered of k+1 rows (never a full sort, never a
  * corpus-wide window); τ returns as a 1-row broadcast. Ties are broken
  * by id ascending (u collisions are possible in principle at 2^-48).
  *
  * Output: the k sampled rows as (idCol, weightCol, priority, w_hat),
  * ordered by priority DESC then id. When the input has ≤ k rows the
  * whole input is the sample and ŵ = w exactly (τ = 0).
  */
object PrioritySample {

  /** md5-uniform in (0,1] as an exact dyadic rational — deterministic per
    * (salt, id), replayable as SQL text by any engine with md5. */
  private def u01(salt: String, id: Column): Column =
    (conv(substring(md5(concat(lit(salt + "|"), id.cast("string"))), 1, 12),
      16, 10).cast("long") + 1).cast("double") / 281474976710656.0d

  /** Sample `k` rows from `df` with probability proportional to (a
    * monotone function of) `weightCol`; attaches the DLT unbiased
    * per-row estimate `w_hat`. `weightCol` must be a non-negative
    * numeric column (cast to double for the priority; zero-weight rows
    * get priority 0 and are sampled last, estimate 0-or-τ as DLT
    * prescribes). */
  def sample(df: DataFrame, idCol: String, weightCol: String, k: Int,
      salt: String): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val keyed = df.select(col(idCol), col(weightCol))
      .withColumn("priority",
        col(weightCol).cast("double") / u01(salt, col(idCol)))
    // ONE bounded TakeOrdered of k+1 rows: k sample rows + the threshold
    // row that defines tau. Never a full sort.
    val top = keyed.orderBy(col("priority").desc, col(idCol).asc).limit(k + 1)
      .localCheckpoint()
    // tau = the (k+1)-th priority = min over the k+1-row frame; an input
    // with <= k rows has no threshold row and tau = 0 (whole-input sample,
    // w_hat = w exactly — the DLT small-n case)
    val tau = top.agg(
      coalesce(when(count(lit(1)) === k + 1, min(col("priority"))), lit(0.0d))
        .as("__tau"))
    val sampled = top.orderBy(col("priority").desc, col(idCol).asc).limit(k)
    sampled.crossJoin(broadcast(tau))
      .select(col(idCol), col(weightCol), col("priority"),
        greatest(col(weightCol).cast("double"), col("__tau")).as("w_hat"))
      .orderBy(col("priority").desc, col(idCol).asc)
  }
}
