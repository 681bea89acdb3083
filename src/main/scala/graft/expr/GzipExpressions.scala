package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Gzip-transparent text decoding — the codec shim in front of every
  * small-document parser (sitemaps, robots mirrors, feed snapshots):
  * `sitemap.xml.gz` is the COMMON spelling of a real sitemap, and the
  * wild also serves gzip bytes under plain `.xml` names, so detection
  * is by MAGIC (0x1f 0x8b), never by extension. Per-row, zero shuffle;
  * reuses the WARC reader's member-tolerant gunzip. */
object GzipOps {

  /** Inflate when the payload carries the gzip magic, else decode the
    * bytes as UTF-8. Magic present but stream invalid → null (a
    * poisoned row, not a task failure — the parser's filter drops it). */
  def gunzipText(b: Array[Byte]): UTF8String = {
    if (b == null) return null
    if (b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b)
      graft.ingest.WarcIngest.gunzip(b) match {
        case Some(x) => UTF8String.fromBytes(x)
        case None => null
      }
    else UTF8String.fromBytes(b)
  }
}

/** `gunzip_text(bytes)` — codegen gzip-transparent UTF-8 decode. */
case class GunzipText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "gunzip_text"

  override def nullSafeEval(input: Any): Any =
    GzipOps.gunzipText(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      |${ev.value} = graft.expr.GzipOps.gunzipText($a);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GzipExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def gunzip_text(bytes: Column): Column =
    ColumnBridge.column(GunzipText(ColumnBridge.expression(bytes)))
}
