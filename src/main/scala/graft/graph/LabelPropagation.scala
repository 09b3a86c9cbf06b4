package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Community detection by synchronous label propagation (Raghavan et al.
  * 2007, the near-linear community baseline every graph stack ships) —
  * the community-structure leg beside components (connectivity), k-core
  * (density) and PageRank (centrality): duplicate-cluster families,
  * topic/host communities in a crawl graph, co-purchase neighborhoods.
  * Extension scope: no reference counterpart (the reference's item
  * signals are per-pair co-occurrence counts).
  *
  * Determinism contract (the PageRank/KCore convention): classic LPA
  * breaks ties randomly and iterates to an unstable fixpoint; here every
  * node votes with its CURRENT label plus each neighbor's, the winner is
  * (max votes, then SMALLEST label), and the round count is FIXED — the
  * result is a pure function of (edges, rounds) that an external engine
  * replays round-for-round as CTEs (ROW_NUMBER over votes DESC, label
  * ASC ≡ the min-struct argmax used here). The self-vote also damps the
  * classic 2-coloring oscillation on bipartite regions.
  *
  * Scale: per round ONE shuffle of the |E|-sized vote stream into a
  * partial-aggregated (node, label) count and ONE |V|-bounded argmax
  * aggregate — both map-side combinable; the symmetrized edge list is
  * checkpointed once and reused every round; each round's label frame is
  * checkpointed (lineage cut) and the superseded one freed immediately
  * (the round-8 block-lifecycle convention, Checkpoints.free).
  *
  * Output: (node, community) — one row per node appearing in `edges`,
  * community = the surviving label (a node id, usually a low one inside
  * each dense region).
  */
object LabelPropagation {

  def run(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val sym = edges
      .select(col(srcCol).as("x"), col(dstCol).as("y"))
      .unionAll(edges.select(col(dstCol).as("x"), col(srcCol).as("y")))
      .filter(col("x") =!= col("y")).distinct()
      .repartition(col("y")).localCheckpoint()
    var labels = sym.select(col("x").as("node")).distinct()
      .select(col("node"), col("node").as("lab"))
      .localCheckpoint()
    var r = 0
    while (r < rounds) {
      val votes = sym
        .join(labels.withColumnRenamed("node", "y"), Seq("y"))
        .select(col("x").as("node"), col("lab"))
        .unionAll(labels) // the self-vote (see the determinism contract)
      val counts = votes.groupBy(col("node"), col("lab"))
        .agg(count(lit(1)).as("__c"))
      val prev = labels
      labels = counts.groupBy(col("node"))
        .agg(min(struct((-col("__c")).as("nc"), col("lab").as("l"))).as("__m"))
        .select(col("node"), col("__m").getField("l").as("lab"))
        .localCheckpoint()
      graft.operators.Checkpoints.free(prev)
      r += 1
    }
    labels.select(col("node"), col("lab").as("community"))
  }
}
