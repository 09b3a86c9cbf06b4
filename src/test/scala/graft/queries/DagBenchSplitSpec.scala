package graft.queries

import graft.SparkSpecBase

/** The q25 bench split (VERDICT r5 task 1): the decomposed forms must
  * compute the SAME result as the oracle-checked in-memory e2e query —
  * otherwise the bench would be measuring a different pipeline than the
  * one Verify certifies.
  */
class DagBenchSplitSpec extends SparkSpecBase {

  test("q25b over the bronze warehouse equals the oracle-checked q25") {
    DagQueries.benchSetup(spark, sfDir)
    val viaBronze = DagQueries.benchDefs("q25b_dag_over_bronze")(spark, sfDir)
      .collect().toSeq
    val inMemory = DagQueries.defs("q25_e2e_dag")(spark, sfDir)
      .collect().toSeq
    assert(viaBronze.nonEmpty)
    assert(viaBronze == inMemory,
      "the DAG over CSV-derived bronze must match the in-memory DAG row-for-row")
  }

  test("benchSetup is idempotent: a second run appends no duplicate batches") {
    DagQueries.benchSetup(spark, sfDir)
    val before = DagQueries.benchDefs("q25b_dag_over_bronze")(spark, sfDir).count()
    DagQueries.benchSetup(spark, sfDir)
    val after = DagQueries.benchDefs("q25b_dag_over_bronze")(spark, sfDir).count()
    assert(before == after, "re-running setup must not double bronze rows")
  }

  test("the ingest form writes a complete fresh warehouse each rep") {
    DagQueries.benchSetup(spark, sfDir)
    val models = DagQueries.benchDefs("q25a_csv_to_bronze")(spark, sfDir)
      .collect().map(_.getString(0)).toSeq
    assert(models == Seq("transactions", "articles", "customers", "images"))
  }

  test("staging over bronze prunes to the latest etl_id partition") {
    DagQueries.benchSetup(spark, sfDir)
    val plan = DagQueries.benchDefs("q25b_dag_over_bronze")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the bronze scan is partitioned by etl_id; the latest-batch join must
    // reach it as partition filters, not a post-scan filter of all batches
    assert(plan.contains("PartitionFilters: [isnotnull(etl_id"),
      s"latest-batch must prune bronze partitions:\n$plan")
  }
}
