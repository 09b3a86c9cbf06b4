package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered funnel analysis: for each user, the earliest time they completed
  * step 1, then the earliest step-2 event STRICTLY AFTER that, then the
  * earliest step-3 event after THAT, and so on — the product-analytics
  * primitive (view → click → purchase) the events surface lacked
  * (extension scope; no reference counterpart).
  *
  * Sequential-dependency dataflow: one pass per step — filter the events
  * to the step's type, join to the accumulated frame on the user key,
  * keep events after the previous step's time, take the min. Every pass
  * is a co-partitioned equi-join + partial-aggregated min on the SAME
  * user key, so after the first shuffle the remaining steps reuse the
  * partitioning; cost is O(steps) scans of the (type-pruned) events — at
  * 100 TB the type filter pushes to the scan, so each pass reads only
  * its step's slice. Strict `>` means a simultaneous next-step event
  * does not count (the conservative funnel convention); all outputs are
  * epoch-microsecond longs, exact in any engine.
  */
object Funnel {

  /** One row per user appearing in step 1's events: t_1..t_n (epoch µs,
    * null once the funnel broke) and `steps_completed`. */
  def completion(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val us: Column = unix_micros(col(tsCol))
    def stepEvents(t: String) =
      events.filter(col(typeCol) === t)
        .select(col(userCol).as("__u"), us.as("__t"))
    val first = stepEvents(steps.head)
      .groupBy(col("__u")).agg(min(col("__t")).as("t_1"))
    val acc = steps.zipWithIndex.drop(1).foldLeft(first) {
      case (accDf, (step, i)) =>
        val prev = s"t_$i"
        val cur = s"t_${i + 1}"
        val next = stepEvents(step)
          .join(accDf.select(col("__u"), col(prev)), Seq("__u"))
          .filter(col("__t") > col(prev))
          .groupBy(col("__u")).agg(min(col("__t")).as(cur))
        accDf.join(next.select(col("__u"), col(cur)), Seq("__u"), "left")
    }
    val completed = steps.indices
      .map(i => when(col(s"t_${i + 1}").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    acc.withColumnRenamed("__u", userCol)
      .withColumn("steps_completed", completed)
  }
}
