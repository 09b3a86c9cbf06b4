package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression ↔ Column bridge. Spark 4 hides the classic converters
  * behind `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`),
  * and the function-registry route (`call_function`) can only pass
  * LITERAL children — but graft's fused retrieval kernel
  * (graft.sql.TopKDotF32) must carry a `Broadcast` HANDLE so the catalog
  * matrix is stored once per executor instead of deserialized once per
  * task from the task binary (round-12 advice). This object lives inside
  * the org.apache.spark.sql package solely to re-export those two
  * converters; it contains no other logic.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
