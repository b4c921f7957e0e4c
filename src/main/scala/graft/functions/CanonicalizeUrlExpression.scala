package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.SqlShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 URL canonicalization as a NATIVE Catalyst expression (the
  * preferred extension tier over a Scala UDF — SURVEY.md §7.5): null-safe,
  * participates in whole-stage codegen via a direct static call (no UDF
  * closure serialization, no extra null-handling wrapper, fuses into the
  * surrounding generated code), and is SQL-registrable as
  * `canonicalize_url(str)`.
  */
case class CanonicalizeUrl(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"canonicalize_url expects STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "canonicalize_url"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      CanonicalUrl.canonicalize(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.CanonicalUrl.canonicalize($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): CanonicalizeUrl =
    copy(child = newChild)
}

object CanonicalizeUrl {
  /** Column-level entry point: `canonicalize_url($"url")`. */
  def canonicalize_url(c: Column): Column =
    SqlShim.column(CanonicalizeUrl(SqlShim.expression(c)))

  /** Register `canonicalize_url` for SQL use in the session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "canonicalize_url", exprs => CanonicalizeUrl(exprs.head), "built-in")
}
