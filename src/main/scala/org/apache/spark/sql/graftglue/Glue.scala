package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions
  * (VecDot, SignBits). `ExpressionUtils` is `private[sql]`, so the
  * conversion lives in an org.apache.spark.sql subpackage — the
  * standard pattern for libraries that ship custom expressions
  * (same approach as spark-sedona / frameless).
  */
object Glue {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
