package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

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

  private def integral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Budget-fused [[run]]: under `maxEdges` the weighted multi-edge list
    * is a BOUNDED ARTIFACT (one map-side-grouped shuffle, budget-probed
    * distributed-first, collected once) and the whole R-round min-plus
    * relaxation is rounds·O(m) exact long arithmetic — the same order of
    * work as one collect of the graph, so the per-round join+checkpoint
    * scaffolding is pure overhead at this size. Bit-identical distances
    * (min/+ on longs are order-free); None past the budget, for
    * non-integral or mismatched id types, or when any endpoint/weight is
    * null (the join plan's null semantics are kept by falling back). */
  def runFused(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, source: Long, rounds: Int,
      maxEdges: Long = 4000000L): Option[DataFrame] = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val srcT = edges.schema(srcCol).dataType
    val dstT = edges.schema(dstCol).dataType
    if (!integral(srcT) || srcT != dstT || maxEdges <= 0) return None
    val spark = edges.sparkSession
    import spark.implicits._
    val grouped = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"),
        col(weightCol).cast("long").as("w"))
      .groupBy(col("u"))
      .agg(collect_list(struct(col("v"), col("w"))).as("out"),
        count(lit(1)).as("cnt"))
      .localCheckpoint()
    val probe = grouped.agg(coalesce(sum(size(col("out"))), lit(0L)),
      coalesce(sum(col("cnt")), lit(0L)),
      coalesce(sum(when(col("u").isNull, 1L).otherwise(0L)), lit(0L))).head()
    val m = probe.getLong(0)
    if (m == 0L || m > maxEdges || m != probe.getLong(1)
        || probe.getLong(2) != 0L) {
      graft.operators.Checkpoints.free(grouped)
      return None
    }
    val rows = grouped.collect()
    graft.operators.Checkpoints.free(grouped)
    // a null v or w inside a struct survives collect_list — detect and refuse
    val adj = new java.util.HashMap[Long, Array[(Long, Long)]](rows.length * 2)
    var nullInner = false
    rows.foreach { r =>
      val out = r.getSeq[org.apache.spark.sql.Row](1).map { e =>
        if (e.isNullAt(0) || e.isNullAt(1)) { nullInner = true; (0L, 0L) }
        else (e.getLong(0), e.getLong(1))
      }.toArray
      adj.put(r.getLong(0), out)
    }
    if (nullInner) return None
    val dist = new java.util.HashMap[Long, Long]()
    dist.put(source, 0L)
    var r = 0
    while (r < rounds) {
      val prev = new java.util.HashMap[Long, Long](dist)
      prev.forEach { (node, d) =>
        val out = adj.get(node)
        if (out != null) {
          var i = 0
          while (i < out.length) {
            val cand = d + out(i)._2
            // containsKey, not get: a missing boxed-Long key would unbox
            // null to 0L and silently refuse every relaxation
            if (!dist.containsKey(out(i)._1) || cand < dist.get(out(i)._1))
              dist.put(out(i)._1, cand)
            i += 1
          }
        }
      }
      r += 1
    }
    val b = Seq.newBuilder[(Long, Long)]
    dist.forEach((node, d) => b += ((node, d)))
    Some(spark.createDataset(b.result()).toDF("node", "dist"))
  }

  /** Budget dispatcher for [[run]]. */
  def runAuto(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, source: Long, rounds: Int,
      maxEdges: Long = 4000000L): DataFrame =
    runFused(edges, srcCol, dstCol, weightCol, source, rounds, maxEdges)
      .getOrElse(run(edges, srcCol, dstCol, weightCol, source, rounds))
}
