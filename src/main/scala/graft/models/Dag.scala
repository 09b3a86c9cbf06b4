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

  /** A reusable artifact is a COMMITTED one: the bare directory also exists
    * after a killed mid-write run (overwrite deletes the old data first),
    * so reuse keys on the committer's _SUCCESS marker, not the dir. */
  private def committed(spark: SparkSession, name: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path(name), "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private final class Run(spark: SparkSession, refresh: Set[String]) {
    // model name -> (resolved frame, was it (re)built this run)
    private val memo = scala.collection.mutable.Map.empty[String, (DataFrame, Boolean)]

    def resolve(n: String, stack: List[String] = Nil): (DataFrame, Boolean) =
      memo.getOrElseUpdate(n, {
        require(!stack.contains(n), s"cycle: ${(n :: stack).reverse.mkString(" -> ")}")
        val m = byName.getOrElse(n, throw new NoSuchElementException(s"unknown model $n"))
        val deps = m.deps.map(d => d -> resolve(d, n :: stack))
        // refresh CASCADES: a table artifact is stale the moment any
        // transitive dep was rebuilt this run — reusing it would silently
        // combine new upstream data with old downstream results
        val depRebuilt = deps.exists(_._2._2)
        if (m.table && !refresh.contains(n) && !depRebuilt && committed(spark, n))
          (spark.read.parquet(path(n)), false)
        else {
          val df = m.build(spark, deps.map { case (d, (v, _)) => d -> v }.toMap)
          if (m.table) {
            df.write.mode("overwrite").parquet(path(n))
            (spark.read.parquet(path(n)), true)
          } else (df, depRebuilt || refresh.contains(n))
        }
      })
  }

  /** Resolve a model (and transitively its deps), memoized within the call.
    * `refresh` forces listed table models to rebuild, and rebuilds cascade
    * to every downstream table artifact. */
  def resolve(spark: SparkSession, name: String,
      refresh: Set[String] = Set.empty): DataFrame =
    new Run(spark, refresh).resolve(name)._1

  /** Resolve every model (shared memo, dependency order). */
  def runAll(spark: SparkSession, refresh: Set[String] = Set.empty): Map[String, DataFrame] = {
    val run = new Run(spark, refresh)
    models.map(m => m.name -> run.resolve(m.name)._1).toMap
  }
}
