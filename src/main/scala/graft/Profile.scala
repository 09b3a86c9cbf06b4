package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only micro-profiler: times named sub-plans of the hot bench queries
  * inside one warm JVM, so optimization targets are measured, not guessed.
  * Not part of the driver contract.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[profile] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    import graft.functions.{LangId, TextOps, VectorOps}
    import graft.dedup.TextDedup
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("warmup_docs_scan")(docs)

    val bound = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("__toks"))
    val boundSh = TextOps.wordShingles(col("__toks"), 8)
    time("tokens_bound")(bound)
    time("shingles_bound")(bound.select(col("doc_id"), boundSh.as("s")))
    val filtered = bound.filter(size(col("__toks")) >= 8)
    time("minhash8_bound")(TextDedup.minhashSignatures(filtered, "doc_id", boundSh, 8))
    time("minhash16_bound")(TextDedup.minhashSignatures(filtered, "doc_id", boundSh, 16))
    time("q33_full")(SparkEntry.queries("q33_minhash_sig")(spark, sfDir))
    time("q36_full")(SparkEntry.queries("q36_langid")(spark, sfDir))
    time("q34_full")(SparkEntry.queries("q34_shingle_jaccard")(spark, sfDir))
    time("q37_full")(SparkEntry.queries("q37_lsh_neardup")(spark, sfDir))

    import graft.sim.Knn
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    graft.sql.GraftFunctions.register(spark)
    val signs = Knn.srpSigns(8 * 4, 64)
    val bucketCols = (0 until 8).map { t =>
      struct(lit(t).as("t"), Knn.srpBucket(col("embedding"), signs.slice(t * 4, (t + 1) * 4)).as("b"))
    }
    time("q43_norm_only")(emb.select(col("vec_id"), VectorOps.l2Normalize(col("embedding")).as("nv")))
    val withBuckets = emb
      .select(col("vec_id"), VectorOps.l2Normalize(col("embedding")).as("__nv"),
        explode(array(bucketCols: _*)).as("tb"))
      .select(col("vec_id"), col("__nv"), col("tb.t").as("t"), col("tb.b").as("bucket"))
    time("q43_buckets_only")(withBuckets)
    val q = withBuckets.select(col("t"), col("bucket"), col("vec_id").as("query_id"), col("__nv").as("__qn"))
    val c = withBuckets.select(col("t"), col("bucket"), col("vec_id").as("neighbor_id"), col("__nv").as("__cn"))
    val scored = q.join(c, Seq("t", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.sql.GraftFunctions.dotF32(col("__qn"), col("__cn")).as("cos"))
      .groupBy(col("query_id"), col("neighbor_id")).agg(max(col("cos")).as("cos"))
    time("q43_scored_notopk")(scored)
    time("q43_full")(SparkEntry.queries("q43_knn_lsh")(spark, sfDir))

    import graft.models.StarDag
    time("q25_tx_raw")(StarDag.transactionsRaw(spark, sfDir))
    val env = graft.operators.Relational.toEnvelope(
      StarDag.transactionsRaw(spark, sfDir), "transactions", 1700000000L, "batch-1")
    time("q25_tx_envelope")(env)
    time("q25_tx_staging")(StarDag.staging(env, StarDag.txSchema))
    time("q25_full")(SparkEntry.queries("q25_e2e_dag")(spark, sfDir))

    import graft.rank._
    val (tr, te) = Interactions.splitByTime(Interactions.fromStar(spark, sfDir), "2000-01-01")
    time("cooccur_neighbors")(Cooccur.itemNeighbors(tr, 50))
    val nb = Cooccur.itemNeighbors(tr, 50)
    time("cooccur_recommend")(Cooccur.recommend(tr, nb, 10))
    time("q51_full")(SparkEntry.queries("q51_rank_eval")(spark, sfDir))
    spark.stop()
  }
}
