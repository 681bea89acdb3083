package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.DateParser

/** Codegen entry point: a Scala object gets a static forwarder, so generated
  * Java calls `graft.expr.DateParseCodegen.parse(s)` directly. */
object DateParseCodegen {
  private val epoch = java.time.LocalDate.ofEpochDay(0)

  /** One parse → struct(error, value): exactly one field is null. */
  def parse(s: UTF8String): InternalRow = {
    val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
    DateParser.parseDate(if (s == null) null else s.toString) match {
      case Right(d)  => r.update(1, d.toEpochDay.toInt)
      case Left(err) => r.update(0, UTF8String.fromString(err))
    }
    r
  }
}

/** Native Catalyst expression for the reference's multi-format date parser
  * (E1/E2, SURVEY.md §2.6): `parse_date_struct(s) = struct(error, value)`.
  *
  * One parse serves both the quarantine channel (error) and the typed value —
  * and unlike the equivalent Scala UDF it stays inside whole-stage codegen
  * (the ingest validation projection is the one place a UDF would split the
  * generated stage). Null/blank input yields the reference's "Empty date
  * string" error, matching `date_parser.py:27-28`.
  */
case class ParseDateStruct(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ParseDateStruct.schema
  override def nullable: Boolean = false
  override def prettyName: String = "parse_date_struct"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    DateParseCodegen.parse(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        InternalRow ${ev.value} = graft.expr.DateParseCodegen.parse(
          ${c.isNull} ? null : ${c.value});
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ParseDateStruct {
  val schema: StructType = StructType(Seq(
    StructField("error", StringType, nullable = true),
    StructField("value", DateType, nullable = true)))
}
