package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GloVe-style windowed token co-occurrence — the statistic word-vector
  * training consumes (Pennington et al. 2014): for every ordered token
  * pair within a window of W positions, accumulate weight 1/distance.
  *
  * Exactness device: distances are 1..W, so weights are accumulated in
  * units of 1/LCM(1..W) — weight_scaled = LCM/d is an exact integer and
  * the total is an exact long (GloVe's own 1/d weighting with zero float
  * accumulation; divide by LCM at read time). For W = 4, LCM = 12.
  *
  * Scale: the pair stream is built WITHOUT a positional self-join — for
  * each offset d, one `arrays_zip(slice, slice)` pairs every token with
  * its d-right neighbor, so the work is O(L·W) per doc, linear in corpus
  * bytes (a doc-keyed positional join would be O(L²) on long docs). One
  * partial-aggregated shuffle on the (w1, w2) pair key; vocabulary skew
  * (stopword pairs) is absorbed by map-side combine.
  */
object Cooccurrence {

  private def lcm(a: Long, b: Long): Long = {
    @annotation.tailrec def gcd(x: Long, y: Long): Long = if (y == 0) x else gcd(y, x % y)
    a / gcd(a, b) * b
  }

  /** Weighted co-occurrence counts over (idCol, toksCol: array<string>)
    * rows: one row per ordered within-window pair — (w1, w2, n_pairs,
    * weight_scaled) with weight_scaled = Σ LCM(1..window)/distance.
    * True GloVe weight = weight_scaled / LCM (exact rational). */
  def glove(docs: DataFrame, toksCol: Column, window: Int): DataFrame = {
    require(window >= 1 && window <= 16, s"window in [1,16]: $window")
    val scale = (1 to window).map(_.toLong).reduce(lcm)
    val toks = docs.select(toksCol.as("__t"))
    val pairsAtD = (1 to window).map { d =>
      val len = greatest(size(col("__t")) - d, lit(0))
      toks.select(lit(scale / d).as("__w"),
          explode(arrays_zip(
            slice(col("__t"), lit(1), len).as("l"),
            slice(col("__t"), lit(d + 1), len).as("r")))
            .as("__p"))
        .select(col("__p").getField("l").as("w1"),
          col("__p").getField("r").as("w2"), col("__w"))
    }
    pairsAtD.reduce(_ unionByName _)
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("__w")).as("weight_scaled"))
  }
}
