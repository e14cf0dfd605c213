package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4's public `Column` no longer exposes `.expr`, and the classic-API
  * helpers are `private[sql]`; this is the conventional extension seam for
  * libraries shipping native expressions (same approach as third-party Spark
  * connectors/UDF libraries).
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a native expression under a SQL-callable name on an existing
    * session (the extensions-free path; see `graft.GraftExtensions` for the
    * builder-time `SparkSessionExtensions` route).
    */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")
}
