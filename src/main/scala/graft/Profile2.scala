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
    import graft.rank._
    val (tr, _) = Interactions.splitByTime(Interactions.fromStar(spark, sfDir), "2000-01-01")
    time("warmup")(tr)
    val nb = Cooccur.itemNeighbors(tr, 50)
    val rec = Cooccur.recommend(tr, nb, 10)
    val plan = rec.queryExecution.executedPlan.toString
    println("[plan] exchanges in recommend total: " + "Exchange".r.findAllIn(plan).length)
    time("recommend_full")(rec)
    time("q50_full")(SparkEntry.queries("q50_topk_retrieval")(spark, sfDir))
    time("q51_full")(SparkEntry.queries("q51_rank_eval")(spark, sfDir))
    time("q52_full")(SparkEntry.queries("q52_recs_table")(spark, sfDir))
    spark.stop()
  }
}
