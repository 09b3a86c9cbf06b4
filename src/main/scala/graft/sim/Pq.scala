package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VecCentroidAgg
import graft.sql.GraftFunctions

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011): split each vector into `m` subvectors,
  * k-means each subspace independently, and store a vector as m small
  * integer codes — 64-dim float32 (256 B) at m=8,k=256 becomes 8 bytes
  * (32×). Queries score the COMPRESSED corpus via asymmetric distance
  * (ADC): one m×k lookup table per query, then m table lookups + m-1 adds
  * per corpus row. The storage-scale path for 100 TB embedding corpora,
  * complementing SRP-LSH (hash route) and IVF (cluster route) in this
  * package; in production the three compose (IVF cells × PQ codes).
  *
  * Scale design:
  *  - codebooks are bounded by construction (m·k·subDim floats) and live
  *    on the driver between Lloyd steps, like Ivf.fitCentroids;
  *  - each fit iteration is ONE distributed job for ALL subspaces: the m
  *    per-subspace assignments are a single projection (m codegen'd
  *    IvfProbeF32 matrix loops), exploded to (sub, cid, subvec) and
  *    aggregated with the merge-associative VecCentroidAgg — one shuffle
  *    of m·k centroid partials per iteration, not m separate k-means;
  *  - encoding is a pure projection (zero shuffle); ADC scoring is a pure
  *    projection over literal lookup arrays (plan size O(m·k) in ONE
  *    literal object per subspace, no codegen blowup).
  */
object Pq {

  /** Fit m codebooks of k centroids each over equal vector slices.
    * Deterministic: md5-ordered init sample, exact-decimal centroid means
    * (VecCentroidAgg), empty cells keep their previous centroid. Returns
    * books(sub)(cid) = subDim floats. */
  def fitCodebooks(df: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, iters: Int = 3): Array[Array[Array[Float]]] = {
    GraftFunctions.register(df.sparkSession)
    GraftFunctions.enableBoundedObjectAgg(df.sparkSession) // subDim-bounded centroid buffers over m×k groups
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    val init: Array[Array[Array[Float]]] = {
      val sample = df.select(col(idCol), col(vecCol))
        .orderBy(md5(col(idCol).cast("string")), col(idCol))
        .limit(k)
        .select(col(vecCol)).collect()
        .map(_.getSeq[Float](0).toArray)
      require(sample.length == k, s"need at least k=$k rows to init, got ${sample.length}")
      Array.tabulate(m)(s => sample.map(_.slice(s * subDim, (s + 1) * subDim)))
    }
    (0 until iters).foldLeft(init) { (books, _) =>
      val assigns = (0 until m).map { s =>
        val sub = slice(col(vecCol), s * subDim + 1, subDim)
        struct(lit(s).as("sub"),
          GraftFunctions.ivfProbeF32(sub, books(s), 1).getItem(0).as("cid"),
          sub.as("v"))
      }
      val updated = df
        .select(explode(array(assigns: _*)).as("a"))
        .groupBy(col("a.sub").as("sub"), col("a.cid").as("cid"))
        .agg(VecCentroidAgg.centroid(col("a.v")).as("c"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Float](2).toArray)
        .toMap
      Array.tabulate(m)(s => Array.tabulate(k)(j => updated.getOrElse((s, j), books(s)(j))))
    }
  }

  /** The m-code array expression for a vector column: code(s) = argmin
    * distance to books(s) (ties → lower cid, the IvfProbeF32 contract). */
  def codeColumn(vec: Column, books: Array[Array[Array[Float]]]): Column = {
    val subDim = books(0)(0).length
    array(books.indices.map { s =>
      GraftFunctions.ivfProbeF32(
        slice(vec, s * subDim + 1, subDim), books(s), 1).getItem(0)
    }: _*)
  }

  /** Encode vectors to m codes: (id, code array<int>). Pure projection —
    * zero shuffle. */
  def encode(df: DataFrame, idCol: String, vecCol: String,
      books: Array[Array[Array[Float]]]): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.select(col(idCol), codeColumn(col(vecCol), books).as("code"))
  }

  /** Per-query ADC lookup table: lut(sub)(cid) = dot(querySub, centroid)
    * in double — the inner products the compressed score sums. */
  def lutFor(query: Array[Float], books: Array[Array[Array[Float]]]): Array[Array[Double]] = {
    val subDim = books(0)(0).length
    books.zipWithIndex.map { case (book, s) =>
      val qs = query.slice(s * subDim, (s + 1) * subDim)
      book.map(c => c.indices.foldLeft(0.0)((acc, i) =>
        acc + qs(i).toDouble * c(i).toDouble))
    }
  }

  /** ADC score column over an encoded corpus: fixed-order sum of m lookups
    * into per-subspace literal arrays (approximates dot(query, vec)). */
  def adcScore(code: Column, luts: Array[Array[Double]]): Column =
    luts.zipWithIndex.map { case (lut, s) =>
      element_at(typedLit(lut.toSeq), code.getItem(s) + 1)
    }.reduce(_ + _)

  /** Top-k of the corpus for one query vector, scored entirely on codes
    * (no full-width vectors touched; rerank survivors exactly if needed). */
  def adcTopK(encoded: DataFrame, idCol: String, query: Array[Float],
      books: Array[Array[Array[Float]]], k: Int): DataFrame =
    encoded
      .select(col(idCol), adcScore(col("code"), lutFor(query, books)).as("adc"))
      .orderBy(col("adc").desc, col(idCol))
      .limit(k)

  /** ADC top-k with exact rerank (the production composition): over-fetch
    * `overfetch`·k candidates on codes alone, then score just those
    * survivors against their full-width vectors — quantization error
    * decides only the longlist, never the final ranking. */
  def adcTopKRerank(df: DataFrame, idCol: String, vecCol: String,
      encoded: DataFrame, query: Array[Float],
      books: Array[Array[Array[Float]]], k: Int, overfetch: Int = 4): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val longlist = adcTopK(encoded, idCol, query, books, k * overfetch)
      .select(col(idCol))
    df.join(longlist, Seq(idCol), "left_semi")
      .select(col(idCol),
        GraftFunctions.dotF32(col(vecCol), typedLit(query.toSeq)).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Persist fitted codebooks as parquet (sub, cid, vec) — the PQ model
    * artifact, same philosophy as Ivf.saveCentroids and Categorify
    * dictionaries: a plain dataset, joinable and inspectable anywhere.
    * Bounded at m·k rows by construction, so a serving restart reloads
    * instead of refitting (reference analog: per-run model save/reload,
    * /root/reference/src/my_merlin_flow.py:327-331). */
  def saveCodebooks(spark: org.apache.spark.sql.SparkSession,
      books: Array[Array[Array[Float]]], path: String): Unit = {
    import spark.implicits._
    books.zipWithIndex.flatMap { case (book, s) =>
      book.zipWithIndex.map { case (c, j) => (s, j, c.toSeq) }
    }.toSeq
      .toDF("sub", "cid", "vec").repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Inverse of [[saveCodebooks]]: books(sub)(cid) = subDim floats, in
    * (sub, cid) order. Rejects a ragged artifact rather than mis-indexing. */
  def loadCodebooks(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Array[Array[Float]]] = {
    val rows = spark.read.parquet(path).orderBy(col("sub"), col("cid"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray))
    val books = rows.groupBy(_._1).toArray.sortBy(_._1)
      .map { case (_, cells) => cells.sortBy(_._2).map(_._3) }
    require(books.nonEmpty && books.forall(_.length == books(0).length),
      s"ragged codebook artifact at $path")
    books
  }

  /** Deterministic synthetic codebooks (the fit-free form for oracles and
    * kernel benches — same philosophy as Ivf.syntheticCentroids). */
  def syntheticCodebooks(m: Int, k: Int, subDim: Int): Array[Array[Array[Float]]] =
    Array.tabulate(m)(s => Array.tabulate(k)(c =>
      Array.tabulate(subDim)(j => (((s * 13 + c * 31 + j * 7) % 89) - 44) / 44.0f)))

  /** Deterministic synthetic query vector — ONE definition shared by the
    * q82 oracle and the q83 kernel bench so they can't drift apart. */
  def syntheticQuery(dim: Int): Array[Float] =
    Array.tabulate(dim)(j => (((j * 11) % 23) - 11) / 11.0f)
}
