package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression conversion for graft's native expressions.
  *
  * Spark 4 made these helpers `private[sql]`; hosting this one-file bridge
  * inside the `org.apache.spark.sql` namespace is the standard technique
  * third-party expression libraries use to adapt (the alternative —
  * registering every function through SparkSessionExtensions and resolving
  * by name — would make plain Column-API calls depend on session config). */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
