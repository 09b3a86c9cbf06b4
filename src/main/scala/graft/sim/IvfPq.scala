package graft.sim

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import graft.sql.GraftFunctions

/** IVF×PQ: the production ANN index shape (FAISS's IVFADC layout) — a
  * coarse quantizer routes queries to `nprobe` of `nlist` cells, and
  * within cells vectors exist only as m-byte PQ codes scored by ADC.
  * At 100 TB this is the difference between scanning compressed codes of
  * a few cells and touching the full-width corpus: storage ~dim·4/m×
  * smaller, candidate set ~nprobe/nlist of the corpus.
  *
  * The index is ONE DataFrame artifact: (id, cid, code) — plain parquet,
  * partitionable by cid so a probe prunes whole files; both quantizers
  * are bounded driver-side matrices, persisted together by [[save]] /
  * [[load]] (centroids + codebooks as two small parquet datasets under
  * one path) so a serving restart reloads instead of refitting.
  *
  * Two encodings ship: raw-vector codes (`fit`/`index`/`topK` — one
  * codebook serves every cell, one less artifact to reason about) and the
  * textbook residual form (`fitResidual`/`indexResidual`/`topKResidual` —
  * PQ over v − centroid(cell), lower-variance input so the same (m, k)
  * bits quantize finer; scoring adds the per-cell dot(q, c) constant back).
  * IvfPqSpec asserts the residual form's recall dominates raw codes on the
  * fixture.
  */
object IvfPq {

  case class Model(centroids: Array[Array[Float]],
      books: Array[Array[Array[Float]]])

  /** Persist the full model (coarse centroids + PQ codebooks) under one
    * path as two bounded parquet datasets. Works for raw and residual
    * models alike — the artifact doesn't care what the codebooks were fit
    * over, only [[indexResidual]]/[[topKResidual]] vs [[index]]/[[topK]]
    * do. */
  def save(spark: org.apache.spark.sql.SparkSession,
      model: Model, path: String): Unit = {
    Ivf.saveCentroids(spark, model.centroids, s"$path/centroids")
    Pq.saveCodebooks(spark, model.books, s"$path/codebooks")
  }

  /** Inverse of [[save]]: reload a fitted model with no refit. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model =
    Model(
      Ivf.loadCentroids(spark, s"$path/centroids"),
      Pq.loadCodebooks(spark, s"$path/codebooks"))

  /** Fit both quantizers (coarse cells + PQ codebooks) on the corpus. */
  def fit(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int, m: Int, k: Int, iters: Int = 3): Model =
    Model(
      Ivf.fitCentroids(df, idCol, vecCol, nlist, iters),
      Pq.fitCodebooks(df, idCol, vecCol, m, k, iters))

  /** Build the index table: (id, cid, code). Pure projection — both
    * assignments are codegen'd matrix loops, zero shuffle; write it
    * `.partitionBy("cid")` and probes prune at the file level. */
  def index(df: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.select(col(idCol),
        Ivf.nearestCell(col(vecCol), model.centroids).as("cid"),
        Pq.codeColumn(col(vecCol), model.books).as("code"))
  }

  /** Top-k for one query: probe its `nprobe` nearest cells, ADC-score only
    * those cells' codes, optional exact rerank against the original
    * vectors (pass `rerankWith` = the full-width corpus). */
  def topK(indexDf: DataFrame, idCol: String, query: Array[Float],
      model: Model, k: Int, nprobe: Int = 2,
      rerankWith: Option[(DataFrame, String)] = None, overfetch: Int = 4): DataFrame = {
    val probed = probeFilter(indexDf, query, model, nprobe)
    rerankWith match {
      case None =>
        Pq.adcTopK(probed, idCol, query, model.books, k)
      case Some((full, vecCol)) =>
        Pq.adcTopKRerank(full, idCol, vecCol, probed, query, model.books, k, overfetch)
    }
  }

  /** The probe: keep only index rows in the query's nprobe nearest cells —
    * a literal IN filter, pushable to a cid-partitioned layout. */
  private def probeFilter(indexDf: DataFrame, query: Array[Float],
      model: Model, nprobe: Int): DataFrame = {
    val cells = nearestCells(query, model.centroids, nprobe)
    indexDf.filter(col("cid").isin(cells: _*))
  }

  // -------------------------------------------------------------------
  // Residual encoding (the textbook IVFADC refinement): PQ codes are fit
  // over v − centroid(cell), which has far less variance than v itself,
  // so the same (m, k) bits quantize finer. Scoring uses
  //   dot(q, v) = dot(q, c) + dot(q, v − c)
  // — a per-cell constant (driver-computed from the bounded centroid
  // matrix) plus the ADC estimate over the residual codes.
  // -------------------------------------------------------------------

  /** The residual column: vec − centroids(cid), with the centroid matrix
    * as ONE literal array-of-arrays (no per-cell plan branching). */
  private def residualColumn(vec: org.apache.spark.sql.Column,
      cid: org.apache.spark.sql.Column,
      centroids: Array[Array[Float]]): org.apache.spark.sql.Column = {
    val matrix = typedLit(centroids.map(_.toSeq).toSeq)
    zip_with(vec, element_at(matrix, cid + 1), (a, b) => a - b)
  }

  /** Fit the residual-encoded model: coarse cells first, then PQ codebooks
    * over the residuals (one extra projection in the fit lineage). */
  def fitResidual(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int, m: Int, k: Int, iters: Int = 3): Model = {
    GraftFunctions.register(df.sparkSession)
    val centroids = Ivf.fitCentroids(df, idCol, vecCol, nlist, iters)
    val res = df.select(col(idCol),
      residualColumn(col(vecCol),
        Ivf.nearestCell(col(vecCol), centroids), centroids).as("__res"))
    Model(centroids, Pq.fitCodebooks(res, idCol, "__res", m, k, iters))
  }

  /** Residual index table: (id, cid, code) where code quantizes v − c.
    * Still a pure projection — zero shuffle. Staged selects materialize
    * the cell id and the residual as columns (TextOps PERF CONTRACT):
    * inlining them would re-run the nlist×dim probe loop inside every one
    * of the m code slices. */
  def indexResidual(df: DataFrame, idCol: String, vecCol: String,
      model: Model): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.select(col(idCol), col(vecCol),
        Ivf.nearestCell(col(vecCol), model.centroids).as("cid"))
      .select(col(idCol), col("cid"),
        residualColumn(col(vecCol), col("cid"), model.centroids).as("__res"))
      .select(col(idCol), col("cid"),
        Pq.codeColumn(col("__res"), model.books).as("code"))
  }

  /** Top-k over a residual index: per-row score = dot(q, centroid(cid)) —
    * looked up from a literal per-cell array — plus the residual ADC.
    * `rerankWith` composes with exact rerank like [[topK]]: the residual
    * scores pick the overfetch·k longlist, full-width dot decides. */
  def topKResidual(indexDf: DataFrame, idCol: String, query: Array[Float],
      model: Model, k: Int, nprobe: Int = 2,
      rerankWith: Option[(DataFrame, String)] = None, overfetch: Int = 4): DataFrame = {
    val cellDots = typedLit(model.centroids.map { c =>
      c.indices.foldLeft(0.0)((a, i) => a + query(i).toDouble * c(i).toDouble)
    }.toSeq)
    def adcRanked(n: Int) = probeFilter(indexDf, query, model, nprobe)
      .select(col(idCol),
        (element_at(cellDots, col("cid") + 1) +
          Pq.adcScore(col("code"), Pq.lutFor(query, model.books))).as("adc"))
      .orderBy(col("adc").desc, col(idCol))
      .limit(n)
    rerankWith match {
      case None => adcRanked(k)
      case Some((full, vecCol)) =>
        GraftFunctions.register(full.sparkSession)
        full.join(adcRanked(k * overfetch).select(col(idCol)), Seq(idCol), "left_semi")
          .select(col(idCol),
            GraftFunctions.dotF32(col(vecCol), typedLit(query.toSeq)).as("score"))
          .orderBy(col("score").desc, col(idCol))
          .limit(k)
    }
  }

  /** Driver-side probe-cell selection for a single query vector (same
    * distance + tie rule as IvfProbeF32: ||c||²−2·q·c, ties → lower cid). */
  def nearestCells(query: Array[Float], centroids: Array[Array[Float]],
      nprobe: Int): Seq[Int] =
    centroids.zipWithIndex.map { case (c, i) =>
      var n2 = 0.0; var d = 0.0; var j = 0
      while (j < c.length) {
        n2 += c(j).toDouble * c(j).toDouble
        d += query(j).toDouble * c(j).toDouble
        j += 1
      }
      (n2 - 2.0 * d, i)
    }.sortBy(identity).take(nprobe).map(_._2).toSeq
}
