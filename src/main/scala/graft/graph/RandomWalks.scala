package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic random-walk corpus generation — the DeepWalk/node2vec
  * input stage (Perozzi et al. 2014): `numWalks` walks of `length` steps
  * from every node, emitted as (walk_id, step, node) traces that a
  * skip-gram trainer (Cooccurrence.glove over the traces) consumes.
  *
  * Determinism device: the "random" neighbor choice at step t of walk w
  * is md5(salt|w|t) reduced mod the current node's out-degree against a
  * RANKED adjacency (neighbors indexed by dst order) — the repo's
  * engine-replayable hash everywhere else, so the full trace set is a
  * pure function of (edges, numWalks, length, salt) and an external
  * engine replays it CTE-for-CTE. No RNG state, no seed plumbing, and
  * walks are embarrassingly parallel by construction.
  *
  * Scale: adjacency ranking is one per-src window (spillable, parallel
  * across nodes); each step is ONE equi-join of the |active walks| state
  * against the src-partitioned adjacency (residual filter picks the
  * indexed neighbor) — walks at dead-end nodes stop (inner join). Fixed
  * `length` joins with localCheckpoint per step (the PageRank lineage
  * convention).
  */
object RandomWalks {

  private def hex48(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  /** Walk traces: (walk_id, step, node), walk_id = start·numWalks + w
    * (computed in LONG — an IntegerType node id near Int.MaxValue/numWalks
    * would otherwise overflow the multiply and collide walk ids, silently
    * corrupting the md5 picks). Starts from every node with at least one
    * out-edge.
    *
    * Block lifecycle: every step's checkpointed state IS part of the
    * output (the trace is the union of all step frames), so unlike the
    * PageRank/KCore loops nothing here is superseded — the per-step
    * blocks live until the caller materializes the trace and drops the
    * reference. Retention is output-sized by construction
    * (numWalks·|V|·length rows), not scaffolding. */
  def walks(edges: DataFrame, srcCol: String, dstCol: String,
      numWalks: Int, length: Int, salt: String): DataFrame = {
    require(numWalks >= 1 && length >= 1, s"numWalks/length >= 1")
    val adj = edges.select(col(srcCol).as("u"), col(dstCol).as("v")).distinct()
      .withColumn("idx",
        row_number().over(Window.partitionBy(col("u")).orderBy(col("v"))) - 1)
      .withColumn("outdeg",
        count(lit(1)).over(Window.partitionBy(col("u"))))
      .repartition(col("u")).localCheckpoint()
    val starts = adj.select(col("u")).distinct()
      .select(col("u"), explode(sequence(lit(0), lit(numWalks - 1))).as("w"))
      .select((col("u").cast("long") * numWalks + col("w")).as("walk_id"),
        col("u").as("cur"))
      .localCheckpoint()
    val frames = scala.collection.mutable.ArrayBuffer[DataFrame]()
    frames += starts.select(col("walk_id"), lit(0).as("step"),
      col("cur").as("node"))
    var state = starts
    var t = 1
    while (t <= length) {
      val pick = hex48(concat(lit(salt + "|"), col("walk_id"),
        lit("|"), lit(t))) % col("outdeg")
      state = state.join(adj, state("cur") === adj("u") && adj("idx") === pick)
        .select(col("walk_id"), col("v").as("cur"))
        .localCheckpoint()
      frames += state.select(col("walk_id"), lit(t).as("step"),
        col("cur").as("node"))
      t += 1
    }
    frames.reduce(_.unionByName(_))
  }
}
