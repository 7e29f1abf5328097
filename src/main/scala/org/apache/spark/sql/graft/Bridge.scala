package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ClassicConversions.ColumnConstructorExt
import org.apache.spark.sql.classic.ColumnConversions

/** Minimal bridge into Spark 4's classic Column↔Expression converters,
  * so graft can expose native Catalyst expressions through the public
  * Column API. Lives in an org.apache.spark.sql subpackage purely for
  * access; contains no Spark-internal logic.
  */
object Bridge {
  def column(e: Expression): Column = Column(e)
  def expression(c: Column): Expression = ColumnConversions.expression(c)
}
