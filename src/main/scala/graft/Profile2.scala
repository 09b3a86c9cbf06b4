package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
object Profile2 {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[profile] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    import graft.models.StarDag
    import graft.operators.Relational
    val txRaw = StarDag.transactionsRaw(spark, sfDir)
    time("warmup")(txRaw)
    def env(df: DataFrame, tpe: String) = Relational.toEnvelope(df, tpe, 1700000000L, "batch-1")
    val tx = StarDag.staging(env(txRaw, "transactions"), StarDag.txSchema)
    time("staging")(tx)
    val dedup = StarDag.dedupTransactions(tx)
    time("dedup")(dedup)
    val art = StarDag.staging(env(StarDag.articlesRaw(spark, sfDir), "articles"), StarDag.articleSchema)
    val cust = StarDag.staging(env(StarDag.customersRaw(spark, sfDir), "customers"), StarDag.customerSchema)
    val img = StarDag.staging(env(StarDag.imagesRaw(spark, sfDir), "images"), StarDag.imageSchema)
    val joined = StarDag.joinedDataframe(dedup, StarDag.articlesMetadata(art, img), cust)
    time("joined")(joined)
    val filtered = StarDag.filteredDataframe(joined, 946684800000000L, 5L, freqSource = dedup)
    time("filtered")(filtered)
    time("final_sorted")(StarDag.finalPull(filtered))
    time("final_unsorted")(StarDag.finalPull(filtered).sortWithinPartitions(col("t_dat_us")))
    spark.stop()
  }
}
