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
  * PageRank/KCore convention) normalization never changes the RANKING,
  * so this implementation keeps integer scores (init 1; auth' = Σ_in
  * hub; hub' = Σ_out auth', the standard half-step order) and replays
  * integer-for-integer in any engine. Raw magnitudes would grow
  * ~(d_max²)^iters per sweep pair — on a web-scale crawl graph (d_max
  * 10⁴–10⁶) that is an ANSI overflow throw by sweep 2–3 — so each
  * half-step applies PageRank's own fixed-point device: an exact
  * integer DIV rescale, div = max(1, floor(max_score / cap)), score ←
  * score div div, with cap = 10¹² units. max is an exact long, div an
  * exact long, DIV exact integer division: the rescaled scores are
  * still a pure integer function of the graph and hash-replay (the
  * q177 oracle replays the same GREATEST/MAX/// CTEs). Post-rescale
  * scores stay < 2·cap, so the next half-step's sum is safe for
  * in-degree/out-degree up to ~4×10⁶ at the default cap; lower `cap`
  * for graphs beyond that. At fixture scale (max < cap) div = 1 and the
  * scores equal the raw recurrence exactly.
  *
  * Scale: per sweep two partial-aggregated equi-join shuffles; the edge
  * list is checkpointed TWICE — src-partitioned for the auth half-step
  * (join key src) and dst-partitioned for the hub half-step (join key
  * dst) — so neither half-step re-shuffles |E| per sweep; each
  * half-step adds one |V|-bounded scalar MAX for the rescale.
  * Superseded score frames are freed immediately and both edge frames
  * before return (Checkpoints.free).
  *
  * Output: (node, hub, auth) for every node in `edges`, exact longs.
  */
object Hits {

  /** Fixed-point magnitude cap per half-step (see object doc). */
  val DefaultCapUnits: Long = 1000000000000L

  def run(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, cap: Long = DefaultCapUnits): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(cap >= 1L, s"cap must be >= 1: $cap")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().repartition(col("src")).localCheckpoint()
    val eDst = e.repartition(col("dst")).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct().localCheckpoint()

    /** Exact integer DIV rescale of `c` so max stays ~cap (no-op DIV by
      * 1 below it); one bounded 1-row scalar agg per half-step. */
    def rescaled(scores: DataFrame, c: String): DataFrame = {
      val ck = scores.localCheckpoint()
      val row = ck.agg(max(col(c))).first()
      val mx = if (row.isNullAt(0)) 0L else row.getLong(0)
      val div = math.max(1L, mx / cap)
      if (div == 1L) ck
      else {
        val r = ck.select(col("node"), expr(s"$c div ${div}L").as(c))
          .localCheckpoint()
        graft.operators.Checkpoints.free(ck)
        r
      }
    }

    var hub = nodes.select(col("node"), lit(1L).as("h")).localCheckpoint()
    var auth = nodes.select(col("node"), lit(1L).as("a")).localCheckpoint()
    var it = 0
    while (it < iters) {
      val prevA = auth
      auth = rescaled(
        e.join(hub.withColumnRenamed("node", "src"), Seq("src"))
          .groupBy(col("dst").as("node")).agg(sum(col("h")).as("a")), "a")
      graft.operators.Checkpoints.free(prevA)
      val prevH = hub
      hub = rescaled(
        eDst.join(auth.withColumnRenamed("node", "dst"), Seq("dst"))
          .groupBy(col("src").as("node")).agg(sum(col("a")).as("h")), "h")
      graft.operators.Checkpoints.free(prevH)
      it += 1
    }
    // the result reads only nodes/hub/auth (all checkpointed) — the edge
    // frames are scaffolding from here on
    graft.operators.Checkpoints.free(e)
    graft.operators.Checkpoints.free(eDst)
    nodes
      .join(hub, Seq("node"), "left")
      .join(auth, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("h"), lit(0L)).as("hub"),
        coalesce(col("a"), lit(0L)).as("auth"))
  }
}
