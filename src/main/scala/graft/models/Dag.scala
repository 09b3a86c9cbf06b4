package graft.models

import org.apache.spark.sql.{DataFrame, SparkSession}

/** dbt-style per-model materialization registry (reference:
  * dbt_project.yml:18-22, where each model dir declares
  * `materialized: table|view`).
  *
  * A model declares its upstream deps and a materialization mode:
  *  - View: composes lazily — Catalyst sees through the model boundary and
  *    prunes/pushes across it (the default, and the right choice when the
  *    whole DAG runs as one job);
  *  - Table: materialized to `<warehouse>/<name>.parquet` the first time it
  *    is resolved; downstream models read the parquet, and a LATER RUN
  *    REUSES the artifact without recomputing (dbt's per-model
  *    rerunnability) unless the model is listed in `refresh`.
  *
  * Scale notes: materialization boundaries trade pushdown for
  * rerunnability + a schema/stats checkpoint — exactly dbt's trade. The
  * registry itself holds no data: resolution is a memoized topological
  * walk; every artifact is parquet, re-partitionable downstream.
  */
final case class DagModel(name: String, deps: Seq[String], table: Boolean = false)(
    val build: (SparkSession, Map[String, DataFrame]) => DataFrame)

final class Dag(models: Seq[DagModel], warehouseDir: String) {
  private val byName = models.map(m => m.name -> m).toMap
  require(byName.size == models.size, "duplicate model names")
  models.foreach(m => m.deps.foreach(d =>
    require(byName.contains(d), s"model ${m.name} depends on unknown $d")))

  private def path(name: String) = s"$warehouseDir/$name.parquet"

  private def exists(spark: SparkSession, name: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path(name))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private final class Run(spark: SparkSession, refresh: Set[String]) {
    private val memo = scala.collection.mutable.Map.empty[String, DataFrame]

    def resolve(n: String, stack: List[String] = Nil): DataFrame =
      memo.getOrElseUpdate(n, {
        require(!stack.contains(n), s"cycle: ${(n :: stack).reverse.mkString(" -> ")}")
        val m = byName.getOrElse(n, throw new NoSuchElementException(s"unknown model $n"))
        if (m.table && !refresh.contains(n) && exists(spark, n))
          spark.read.parquet(path(n))
        else {
          val df = m.build(spark, m.deps.map(d => d -> resolve(d, n :: stack)).toMap)
          if (m.table) {
            df.write.mode("overwrite").parquet(path(n))
            spark.read.parquet(path(n))
          } else df
        }
      })
  }

  /** Resolve a model (and transitively its deps), memoized within the call.
    * `refresh` forces listed table models to rebuild their artifact. */
  def resolve(spark: SparkSession, name: String,
      refresh: Set[String] = Set.empty): DataFrame =
    new Run(spark, refresh).resolve(name)

  /** Resolve every model (shared memo, dependency order). */
  def runAll(spark: SparkSession, refresh: Set[String] = Set.empty): Map[String, DataFrame] = {
    val run = new Run(spark, refresh)
    models.map(m => m.name -> run.resolve(m.name)).toMap
  }
}
