package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge: Spark 4 scoped these conversions
  * private[sql] (classic.ExpressionUtils), the standard extension-library
  * pattern is a bridge object inside the sql package.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame over an RDD of InternalRows WITHOUT the external-Row
    * conversion layer (createDataFrame(RDD[Row]) re-validates and
    * re-encodes every field) — private[sql] in Spark 4, same bridge
    * pattern as the Column accessors above.
    */
  def internalCreateDataFrame(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)
}
