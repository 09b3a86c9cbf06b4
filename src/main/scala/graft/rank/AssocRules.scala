package graft.rank

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules — support / confidence / lift over
  * co-occurring basket items (Agrawal & Srikant 1994's output surface,
  * computed the warehouse way rather than via Apriori candidate
  * generation: pairs straight from the basket self-join, singleton counts
  * joined back). Confidence is exactly Cooccur's retrieval score
  * normalized by the antecedent's reach; lift is the PMI exponential —
  * the three numbers product analytics asks of a co-purchase matrix.
  *
  * Shuffle plan: ONE basket-keyed repartition feeds the distinct, the
  * basket count, AND both sides of the self-join (subset-key clustering —
  * the Cooccur device); the pair stream crosses one partial-aggregated
  * (ante, cons) shuffle with the `minCount` filter applied at the
  * aggregate; singleton counts and the 1-row basket total join back as
  * broadcasts. Per-basket pair space is quadratic in basket size — cap
  * baskets upstream (Interactions.recentN) exactly as Cooccur requires.
  *
  * Determinism: counts are exact longs; support/confidence/lift are
  * single fixed-association IEEE chains over them, so every cell
  * hash-replays in any engine.
  */
object AssocRules {

  /** Directed rules ante → cons with c_pair >= minCount.
    * Output: (ante, cons, c_pair, c_ante, c_cons, n_baskets, support,
    * confidence, lift). */
  def rules(baskets: DataFrame, basketCol: String, itemCol: String,
      minCount: Long = 1L): DataFrame = {
    val t = baskets.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .repartition(col("__b")).distinct()
    val nBaskets = t.select(col("__b")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val itemCounts = t.groupBy(col("__i")).agg(count(lit(1)).as("__c"))
    val pairs = t.as("a").join(t.as("b"),
        col("a.__b") === col("b.__b") && col("a.__i") =!= col("b.__i"))
      .groupBy(col("a.__i").as("ante"), col("b.__i").as("cons"))
      .agg(count(lit(1)).as("c_pair"))
      .filter(col("c_pair") >= minCount)
    pairs
      .join(broadcast(itemCounts.select(col("__i").as("ante"), col("__c").as("c_ante"))),
        Seq("ante"))
      .join(broadcast(itemCounts.select(col("__i").as("cons"), col("__c").as("c_cons"))),
        Seq("cons"))
      .join(broadcast(nBaskets))
      .select(col("ante"), col("cons"), col("c_pair"), col("c_ante"),
        col("c_cons"), col("n_baskets"),
        (col("c_pair").cast("double") / col("n_baskets")).as("support"),
        (col("c_pair").cast("double") / col("c_ante")).as("confidence"),
        ((col("c_pair").cast("double") * col("n_baskets"))
          / (col("c_ante") * col("c_cons"))).as("lift"))
  }
}
