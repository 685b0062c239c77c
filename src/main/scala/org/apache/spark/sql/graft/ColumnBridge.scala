package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column <-> Expression conversion (the classic
  * non-Connect path). Lives in Spark's package namespace solely to reach
  * `org.apache.spark.sql.classic.ExpressionUtils`; no Spark internals are
  * modified. This is the standard extension-library pattern for exposing a
  * custom Catalyst Expression as a user-facing Column on Spark 4.x. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a Catalyst Expression builder as a session SQL function
    * (the `private[sql]` functionRegistry path used by built-ins). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
