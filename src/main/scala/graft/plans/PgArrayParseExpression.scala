package graft.plans

import graft.functions.PgArrayLiteral
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for PG text-array literal parsing
  * (F10): `pg_array_parse('{a,"b c",NULL}')` → `array('a','b c',NULL)`.
  *
  * The regex-built column version ([[PgArrayLiteral.parseCol]]) can't
  * express full quote/escape semantics; a UDF could, but stays a
  * codegen black box with Row serialization overhead. This is the
  * preferred shape from SURVEY §2.10: a `UnaryExpression` whose
  * `doGenCode` emits a direct static call — inlined into whole-stage
  * codegen, null-safe, no UDF wrapper.
  */
final case class PgArrayParseExpression(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pg_array_parse requires STRING input, got ${child.dataType.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def nullSafeEval(input: Any): Any =
    PgArrayParseExpression.parseToArrayData(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.PgArrayParseExpression.parseToArrayData($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "pg_array_parse"
}

object PgArrayParseExpression {
  /** Static entry point shared by interpreted eval and generated
    * code. */
  def parseToArrayData(s: UTF8String): ArrayData =
    new GenericArrayData(
      PgArrayLiteral.parse(s.toString)
        .map(_.map(UTF8String.fromString).orNull)
        .toArray[Any])

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[PgArrayParseExpression].getName, "pg_array_parse")
}
