package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column support (SURVEY §2.1 S12 / §2.8 F14; reference: image
  * fetch + CLIP encoding, app_utils.py:10-26, my_merlin_flow.py:586-599):
  * media as opaque BinaryType columns with typed metadata, batch feature
  * extraction through a mapPartitions seam, embeddings landing in the same
  * ArrayType(FloatType) column the similarity ops consume.
  *
  * The actual decoders (image/audio libs) are NOT in this environment — the
  * model functions below are deterministic STUBS standing in for them; the
  * Spark-side plumbing (schema, batching, partitioning) is real and tested.
  */
object Multimodal {

  /** Wrap a string column as a binary asset column + metadata struct
    * (content type, byte length) — the shape an image-bytes ingest
    * produces. */
  def asBinaryAsset(df: DataFrame, srcCol: String, contentType: String,
      binCol: String = "asset", metaCol: String = "asset_meta"): DataFrame =
    df.withColumn(binCol, col(srcCol).cast("binary"))
      .withColumn(metaCol, struct(
        lit(contentType).as("content_type"),
        octet_length(col(binCol)).as("byte_len")))

  /** Batch-inference seam (the to-the-model boundary, reference
    * my_merlin_flow.py:586-599): runs `model` over fixed-size batches of
    * binary payloads per partition — the shape a real ONNX/TF runtime wants
    * — with no driver-side collection. Output: (idCol, outCol float[dim]).
    */
  def batchEmbed(df: DataFrame, idCol: String, binCol: String,
      batchSize: Int, outCol: String = "embedding")(
      model: Seq[Array[Byte]] => Seq[Array[Float]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val embs = model(batch.map(_._2))
          require(embs.length == batch.length, "model must return one vector per input")
          batch.map(_._1).zip(embs)
        }
      }
      .toDF(idCol, outCol)
  }

  /** Deterministic stub "encoder": md5-seeded pseudo-embedding. Stands in
    * for a real CLIP-style model (not available in this container); useful
    * for exercising the full pipeline shape deterministically. */
  def stubEncoder(dim: Int): Seq[Array[Byte]] => Seq[Array[Float]] =
    batch => batch.map { bytes =>
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(dim) { i =>
        val h = md.digest((i.toString + ":").getBytes("UTF-8") ++ bytes)
        ((h(0) & 0xff) << 8 | (h(1) & 0xff)).toFloat / 65535f
      }
    }

  /** Pure-Column fake feature extraction (the SQL-expressible stand-in used
    * by the oracle-checked query): component j = the j-th 4-hex-digit chunk
    * of md5(payload), scaled to [0,1]. */
  def hashFeature(bin: Column, j: Int): Column =
    conv(substring(md5(bin), j * 4 + 1, 4), 16, 10).cast("int").cast("double") / 65535.0

  /** Frame sampling over an opaque video-like payload: treat the binary as
    * consecutive `frameBytes` frames and emit every `stride`-th one with
    * its index — the Spark-side shape (schema, explode, downstream
    * batching) a real demuxer fills in at the same seam as batchEmbed.
    * Output: (idCol, frame_idx int, frame binary).
    */
  def frameSample(df: DataFrame, idCol: String, binCol: String,
      frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be positive")
    df.select(col(idCol), col(binCol))
      .filter(octet_length(col(binCol)) > 0)
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(0), ((octet_length(col(binCol)) - 1) / frameBytes).cast("int")),
          i => col(binCol).substr(i * frameBytes + 1, lit(frameBytes)))))
      .filter(col("pos") % stride === 0)
      .select(col(idCol), col("pos").cast("int").as("frame_idx"), col("col").as("frame"))
  }
}
