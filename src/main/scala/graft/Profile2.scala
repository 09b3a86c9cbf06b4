package graft
import org.apache.spark.sql.SparkSession
object Profile2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.rank._
    val (tr, _) = Interactions.splitByTime(Interactions.fromStar(spark, "/root/testdata/sf0.01"), "2000-01-01")
    val nb = Cooccur.itemNeighbors(tr, 50)
    val plan = Cooccur.recommend(tr, nb, 10).queryExecution.executedPlan.toString
    val lines = plan.split("\n")
    lines.filter(l => l.contains("Exchange") || l.contains("Window") || l.contains("Join") || l.contains("HashAggregate") || l.contains("Union")).foreach(l => println("[plan] " + l.trim.take(120)))
    spark.stop()
  }
}
