package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.dedup.TextDedup
import graft.operators.CorpusPipeline

/** The full streaming crawl-entry path to the shard boundary: the
  * registry's ROW-LOCAL stages (URL dedup aside — see below; html
  * extraction, quality/classifier gates, PII redaction, token count are
  * pure projections/filters, so batch ≡ stream by construction —
  * CorpusIngestSpec pins it) run per micro-batch, then the batch's
  * survivors dedup incrementally against the persisted signature index
  * exactly as [[DocIngest]] does, and the sink receives the survivors
  * WITH their stage columns (n_tokens and friends — the shape the batch
  * shard packer reads). The order-dependent tail (seeded shuffle, shard/
  * example packing — cross-row prefix sums over the whole corpus) stays
  * batch territory: a pre-training run packs a FROZEN corpus snapshot,
  * so the stream's job ends at "clean, deduped, counted rows in the
  * corpus store", and the packer runs once per snapshot.
  *
  * Stages that SHUFFLE per batch (urlDedup's keep-first window,
  * classifierScore's featurize join) are legal here — they dedup within
  * each micro-batch, while cross-batch suppression is the signature
  * index's job — but each adds a per-batch exchange; keep micro-batches
  * coarse enough to amortize.
  *
  * Scale notes: identical to DocIngest — per-batch cost is the stage
  * chain (linear, codegen) + the batch's LSH pipeline + one (band, hash)
  * shuffle against the index; state lives entirely in the index parquet
  * + the stream checkpoint, so restart is exactly-once without executor
  * state.
  */
object CrawlIngest {

  /** Start the composed ingest stream; `sink` receives each batch's
    * surviving rows with every column the stage chain produced. */
  def start(stream: DataFrame, idCol: String, textCol: String,
      stages: Seq[CorpusPipeline.Stage], indexPath: String,
      shingleN: Int = 8, numHashes: Int = 16, rowsPerBand: Int = 2,
      threshold: Double = 0.7, checkpointDir: Option[String] = None)
      (sink: DataFrame => Unit): StreamingQuery = {
    val writer = stream.writeStream.outputMode("append")
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val spark = batch.sparkSession
        val staged = stages.foldLeft(batch.toDF()) { (d, st) => st.f(spark, d) }
        val outCols = staged.columns.toSeq
        val toked = staged.withColumn("__toks",
          graft.functions.TextOps.tokens(col(textCol)))
        val sh: Column = graft.functions.TextOps.wordShingles(col("__toks"), shingleN)
        val selfDeduped = TextDedup.dropNearDuplicates(
          toked, idCol, sh, numHashes, rowsPerBand, threshold)
        val kept = DocIngest.indexSigsIfAny(spark, indexPath) match {
          case Some(idx) => TextDedup.dedupAgainstIndex(
            selfDeduped, idCol, sh, idx, numHashes, rowsPerBand, threshold)
          case None => selfDeduped
        }
        val keptRows = kept.cache()
        try {
          sink(keptRows.select(outCols.map(col): _*))
          TextDedup.minhashSignatures(
              keptRows.filter(size(sh) > 0), idCol, sh, numHashes)
            .write.mode("append").parquet(indexPath)
        } finally keptRows.unpersist()
        ()
      }
      .start()
  }

  /** The same composition over a STATIC frame — the batch reference the
    * parity spec compares the streamed result against (and the one-shot
    * form for reprocessing a frozen crawl dump). */
  def batch(df: DataFrame, idCol: String, textCol: String,
      stages: Seq[CorpusPipeline.Stage], shingleN: Int = 8,
      numHashes: Int = 16, rowsPerBand: Int = 2,
      threshold: Double = 0.7): DataFrame = {
    val spark = df.sparkSession
    val staged = stages.foldLeft(df) { (d, st) => st.f(spark, d) }
    val outCols = staged.columns.toSeq
    val toked = staged.withColumn("__toks",
      graft.functions.TextOps.tokens(col(textCol)))
    val sh: Column = graft.functions.TextOps.wordShingles(col("__toks"), shingleN)
    TextDedup.dropNearDuplicates(toked, idCol, sh, numHashes, rowsPerBand, threshold)
      .select(outCols.map(col): _*)
  }
}
