package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** gzip-compress a string column to binary (RFC 1952 member, default
  * deflate level, zero MTIME — `java.util.zip.GZIPOutputStream`'s fixed
  * header, so output is deterministic for a given input). Used to
  * generate protocol-sanctioned `.xml.gz` sitemap fixtures
  * ([[graft.ops.Url.syntheticSitemaps]]) and as the compress half of
  * the [[graft.sources.Warc]] gunzip seam; the inverse for text payloads
  * is [[GunzipText]]. Row-local, no state. */
case class GzipCompress(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gzip"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    GzipCompress.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GzipCompress.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GzipCompress {

  def compute(txt: UTF8String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(txt.getBytes)
    gz.close()
    bos.toByteArray
  }

  def apply(c: Column): Column =
    Bridge.column(GzipCompress(Bridge.expression(c)))
}

/** Decode a fetched payload to TEXT, inflating gzip members when the
  * RFC 1952 magic (`1f 8b`) leads — otherwise the bytes pass through as
  * UTF-8. The crawl-archive decode seam ([[graft.sources.Warc.inflate]]
  * handles the same duality stream-wise): sitemaps ship gzipped
  * (`sitemap.xml.gz`, protocol-sanctioned) beside plain XML, and the
  * consumer discriminates by content, not filename. Row-local. */
case class GunzipText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gunzip_text"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    GunzipText.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GunzipText.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GunzipText {

  def compute(bytes: Array[Byte]): UTF8String = {
    val plain =
      if (bytes.length >= 2 && bytes(0) == 0x1f.toByte && bytes(1) == 0x8b.toByte) {
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try in.readAllBytes() finally in.close()
      } else bytes
    UTF8String.fromBytes(plain)
  }

  def apply(c: Column): Column =
    Bridge.column(GunzipText(Bridge.expression(c)))
}
