package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs & authorities (Kleinberg 1999) over a DIRECTED edge list —
  * the link-analysis complement of PageRank for asymmetric graphs: a
  * crawl frontier wants authorities (pages many good hubs point at) and
  * hubs (directories/link pages) as separate signals; on a symmetric
  * graph the two coincide and PageRank is the right tool instead.
  * Extension scope: no reference counterpart.
  *
  * Exactness device: classic HITS L2-normalizes each sweep — a sqrt no
  * engine replays bit-for-bit. With the round count FIXED (the
  * PageRank/KCore convention) normalization is pure cosmetics: it never
  * changes the RANKING, so this implementation keeps raw exact-long
  * scores (init 1; auth' = Σ_in hub; hub' = Σ_out auth', the standard
  * half-step order) and any engine replays them integer-for-integer.
  * Magnitudes grow ~(d_max²)^iters per sweep pair; under this engine's
  * ANSI sessions an overflow THROWS loudly — callers with huge degree ×
  * depth rescale upstream (cap iters, or divide the graph).
  *
  * Scale: per sweep two partial-aggregated equi-join shuffles (edges
  * stay dst- and src-partitioned via one checkpointed frame each);
  * superseded score frames freed immediately (Checkpoints.free).
  *
  * Output: (node, hub, auth) for every node in `edges`, exact longs.
  */
object Hits {

  def run(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().repartition(col("src")).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    var hub = nodes.select(col("node"), lit(1L).as("h")).localCheckpoint()
    var auth = nodes.select(col("node"), lit(1L).as("a")).localCheckpoint()
    var it = 0
    while (it < iters) {
      val prevA = auth
      auth = e.join(hub.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node")).agg(sum(col("h")).as("a"))
        .localCheckpoint()
      graft.operators.Checkpoints.free(prevA)
      val prevH = hub
      hub = e.join(auth.withColumnRenamed("node", "dst"), Seq("dst"))
        .groupBy(col("src").as("node")).agg(sum(col("a")).as("h"))
        .localCheckpoint()
      graft.operators.Checkpoints.free(prevH)
      it += 1
    }
    nodes
      .join(hub, Seq("node"), "left")
      .join(auth, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("h"), lit(0L)).as("hub"),
        coalesce(col("a"), lit(0L)).as("auth"))
  }
}
