package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native fused 64-bit dHash (difference hash) of a BMP payload —
  * (hi, lo) 32-bit halves, the image near-dup signature
  * (ops/Multimodal.imagePhash).
  *
  * Why native: the hash reads ~220 scattered bytes of the payload through
  * a 9×8 brightness grid and 64 comparisons. The composable spelling
  * (hex → lookbehind-split → conv per byte, grid/pack as higher-order
  * transforms) has two structural costs no staging reliably removes:
  * Column vals EXPAND into duplicated subtrees at every reference
  * (Catalyst trees, not DAGs), and higher-order functions evaluate
  * interpreted — and CollapseProject may re-inline a hoisted stage, which
  * took the sf0.01 build from seconds to ~15 min when it fired. One
  * virtual call per row with a plain JVM loop is the shape the engine
  * wants (same rationale as [[ShingleHashes]] / [[L2Squared]]).
  *
  * Semantics are EXACTLY the composable chain the DuckDB oracle replays
  * (imagePhashSql): width/height little-endian at offsets 18/22, rows
  * 4-byte aligned bottom-up, grid sample (x,y) = (⌊gx·w/9⌋, ⌊gy·h/8⌋) in
  * IEEE double division, brightness = b+g+r, bit i of half `base` set
  * when grid(gx+1,gy) > grid(gx,gy) for bi = base+i, gx = bi%8,
  * gy = bi⁄8, weight 2^(31−i). An out-of-range byte read makes its
  * brightness NULL, and a NULL comparison contributes no bit — the
  * element_at/when null propagation of the expression form, so malformed
  * payloads hash to (0, 0) rather than throwing. */
case class BmpDHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BmpDHash.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bmp_dhash"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary input, got " +
          child.dataType.catalogString)

  override def nullSafeEval(input: Any): Any =
    BmpDHash.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BmpDHash.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BmpDHash {
  val schema: StructType = StructType(Seq(
    StructField("hi", LongType, nullable = false),
    StructField("lo", LongType, nullable = false)))

  private final val NULL_BRIGHT = Long.MinValue

  /** The hash core; public + static-shaped so generated code can call it
    * directly (one invocation per row inside whole-stage codegen). */
  def compute(p: Array[Byte]): InternalRow = {
    def byteAt(off: Long): Int =
      if (off < 0 || off >= p.length) -1 else p(off.toInt) & 0xff
    val b18 = byteAt(18); val b19 = byteAt(19)
    val b22 = byteAt(22); val b23 = byteAt(23)
    if (b18 < 0 || b19 < 0 || b22 < 0 || b23 < 0)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0L, 0L))
    // BITMAPINFOHEADER width/height are SIGNED 4-byte fields: a negative
    // biHeight is a valid TOP-DOWN bmp (rows stored top-first). Parse all
    // four bytes and take |h| for geometry — a 2-byte read would turn
    // biHeight = -64 into h = 65472, sample almost every grid point out
    // of range, and hash unrelated top-down images to near-zero (mutual
    // hamming-0 "near-dups"). Row ORDER doesn't matter to the hash — it
    // uses stored order consistently — only the extents do. Nonpositive
    // width (or |h| = 0) is malformed: hash (0, 0), same as a short
    // header. (Synthetic-corpus BMPs have bytes 20/21/24/25 = 0, so this
    // parse is value-identical there and the DuckDB oracle — which
    // derives w/h from the generator parameters — is unaffected.)
    val b20 = byteAt(20); val b21 = byteAt(21)
    val b24 = byteAt(24); val b25 = byteAt(25)
    if (b20 < 0 || b21 < 0 || b24 < 0 || b25 < 0)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0L, 0L))
    val w = (b18 | b19 << 8 | b20 << 16 | b21 << 24).toLong
    val hRaw = (b22 | b23 << 8 | b24 << 16 | b25 << 24).toLong
    val h = math.abs(hRaw)
    if (w <= 0 || h <= 0)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0L, 0L))
    val rowb = w * 3 + 3 - (w * 3 + 3) % 4
    val grid = new Array[Long](72)
    var i = 0
    while (i < 72) {
      // IEEE double division + floor, matching the expression/SQL forms
      val x = math.floor((i % 9) * w / 9.0).toLong
      val y = math.floor((i / 9) * h / 8.0).toLong
      val off = 54L + y * rowb + x * 3
      val b0 = byteAt(off); val b1 = byteAt(off + 1); val b2 = byteAt(off + 2)
      grid(i) = if (b0 < 0 || b1 < 0 || b2 < 0) NULL_BRIGHT
                else (b0 + b1 + b2).toLong
      i += 1
    }
    def half(base: Int): Long = {
      var s = 0L
      var j = 0
      while (j < 32) {
        val bi = base + j
        val gx = bi % 8
        val gy = bi / 8
        val a = grid(gy * 9 + gx + 1)
        val b = grid(gy * 9 + gx)
        if (a != NULL_BRIGHT && b != NULL_BRIGHT && a > b)
          s += 1L << (31 - j)
        j += 1
      }
      s
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](half(0), half(32)))
  }

  /** Column-API form: `dhash(col("payload"))` → struct(hi, lo). */
  def dhash(payload: Column): Column =
    Bridge.column(BmpDHash(Bridge.expression(payload)))
}
