package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact triangle counting + local clustering coefficients over an
  * undirected graph — the degree-ordered orientation algorithm (the
  * MapReduce classic, Suri & Vassilvitskii 2011 / Cohen 2009): orient
  * every edge from its lower-(degree, id) endpoint to the higher, build
  * wedges only from each node's ORIENTED out-neighbors, and close them
  * against oriented edges. Every triangle is counted exactly once — at
  * its lowest-ranked vertex — and the orientation bounds out-degrees by
  * O(√m), so the wedge space is O(m^1.5) no matter how skewed the raw
  * degree distribution is (a celebrity node of degree 10⁷ contributes
  * ZERO wedges from its own adjacency: every triangle through it is
  * charged to a smaller endpoint). That bound is what makes the count
  * feasible at 100 TB; the naive wedge join is Σ deg² and dies on the
  * first hub.
  *
  * Dataflow: canonicalize (distinct min/max pairs, self-loops dropped) →
  * degree table → orient → one self-join on the wedge apex (the two
  * sides share the exchange) → one closing join against the oriented
  * edges → explode each triangle to its 3 corners → per-node count. All
  * counts exact longs; the coefficient is one guarded IEEE division.
  */
object Triangles {

  private def lexLess(d1: Column, n1: Column, d2: Column, n2: Column): Column =
    d1 < d2 || (d1 === d2 && n1 < n2)

  /** Per-node triangle participation and local clustering coefficient.
    * Input edges may be directed/duplicated/self-looped — canonicalized
    * here. Output: (node, degree, triangles, coeff) with
    * coeff = 2·triangles / (degree·(degree−1)), NULL below degree 2. */
  def perNode(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val deg = und.select(col("u").as("n"))
      .unionAll(und.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("degree"))
    val withDeg = und
      .join(deg.select(col("n").as("u"), col("degree").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("degree").as("dv")), Seq("v"))
    // orient lo-(deg, id) -> hi; carry the head's rank for the wedge order
    val lo = lexLess(col("du"), col("u"), col("dv"), col("v"))
    val oriented = withDeg.select(
      when(lo, col("u")).otherwise(col("v")).as("a"),
      when(lo, col("v")).otherwise(col("u")).as("b"),
      when(lo, col("dv")).otherwise(col("du")).as("db"))
    // wedges at apex a: unordered out-neighbor pairs, ranked b1 < b2
    val tri = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.a") === col("e2.a") &&
          lexLess(col("e1.db"), col("e1.b"), col("e2.db"), col("e2.b")))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
      .join(oriented.as("e3").select(col("a").as("y"), col("b").as("z")),
        Seq("y", "z"))
    val corners = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("triangles"))
    deg.join(corners, Seq("n"), "left")
      .select(col("n").as("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("degree") >= 2L,
          (coalesce(col("triangles"), lit(0L)) * 2L).cast("double")
            / (col("degree") * (col("degree") - 1L))).as("coeff"))
  }

  /** Global triangle count (one row) — the corners sum / 3. */
  def globalCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    perNode(edges, srcCol, dstCol)
      .agg((sum(col("triangles")) / 3L).cast("long").as("n_triangles"))
}
