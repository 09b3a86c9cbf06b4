package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-source shortest paths by fixed-round Bellman–Ford relaxation —
  * the BSP min-plus iteration every distributed graph engine ships
  * (Pregel's hello-world; Malewicz et al. 2010). Weights are exact longs
  * and relaxation is min(long + long), so distances are bit-identical in
  * any engine at any parallelism — no float accumulation anywhere.
  *
  * The round count is FIXED by the caller (the PageRank/KCore
  * determinism convention): after R rounds the table holds the exact
  * shortest distance over paths of ≤ R edges — THE oracle-replayable
  * semantics, and the quantity itself callers usually want ("reachable
  * within k hops"); convergence (R ≥ diameter ⇒ fixpoint) is what specs
  * assert.
  *
  * Per round: one join of the |reached|-row frontier table against the
  * src-partitioned edge list + one partial-aggregated min — the edges
  * never reshuffle across rounds (repartition once + localCheckpoint
  * preserves outputPartitioning); lineage is cut every round.
  */
object ShortestPaths {

  /** Distances from `source` over directed weighted edges (srcCol,
    * dstCol, weightCol: long ≥ 0); symmetrize upstream for undirected
    * graphs. Returns (node, dist) for every node reachable in ≤ rounds
    * edges. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, source: Long, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val e = edges.select(col(srcCol).as("u"), col(dstCol).as("v"),
        col(weightCol).cast("long").as("w"))
      .repartition(col("u")).localCheckpoint()
    val spark = edges.sparkSession
    import spark.implicits._
    var dist = Seq((source, 0L)).toDF("node", "dist").localCheckpoint()
    var r = 0
    while (r < rounds) {
      val relaxed = dist.join(e, dist("node") === e("u"))
        .select(col("v").as("node"), (col("dist") + col("w")).as("dist"))
      val prev = dist
      dist = dist.unionByName(relaxed)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .localCheckpoint()
      // eager checkpoint materialized → the previous round's distance
      // blocks are superseded; free them immediately
      graft.operators.Checkpoints.free(prev)
      r += 1
    }
    dist
  }
}
