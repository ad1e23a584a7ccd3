package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native fused 64-bit audio fingerprint of a PCM WAV payload — (hi, lo)
  * 32-bit halves, the audio near-dup signature
  * (ops/Multimodal.audioFingerprint), completing the multimodal dedup
  * family next to [[BmpDHash]].
  *
  * The recipe is the frame-energy transition signature (the simplified
  * core of Haitsma–Kalker's "A Highly Robust Audio Fingerprinting
  * System", ISMIR 2002: band energies → sign of successive differences;
  * here one full-band energy per frame — no FFT dependency, integer
  * exact): the PCM data chunk is cut into 65 equal frames by INTEGER
  * boundaries (frame i covers samples [i·n/65, (i+1)·n/65)), each
  * frame's energy is the exact integer Σ s² over its signed 16-bit LE
  * samples, and bit i (of 64) is set when energy(i+1) > energy(i).
  * Everything is integer arithmetic, so the hash is bit-identical in
  * any engine — the DuckDB oracle replays it from the generator's data
  * bytes digit-by-digit.
  *
  * Parsing is a real RIFF chunk walk (not a fixed offset): chunks from
  * offset 12 are skipped — including the spec's odd-size pad byte —
  * until the `data` chunk; a payload with an extra chunk between `fmt `
  * and `data` (LIST/INFO metadata, common in the wild) fingerprints
  * identically to its canonical layout (WarcSpec-style hostile case in
  * OpsSpec). Malformed payloads (no RIFF/WAVE magic, no data chunk)
  * hash to (0, 0) rather than throwing — the BmpDHash convention.
  *
  * Why native: ~65 frames × frame-length samples of scattered byte
  * reads per row; the composable spelling pays the same
  * tree-duplication + interpreted-HOF taxes BmpDHash documents. */
case class WavEnergyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = WavEnergyHash.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wav_energy_hash"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary input, got " +
          child.dataType.catalogString)

  override def nullSafeEval(input: Any): Any =
    WavEnergyHash.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WavEnergyHash.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WavEnergyHash {
  val schema: StructType = StructType(Seq(
    StructField("hi", LongType, nullable = false),
    StructField("lo", LongType, nullable = false)))

  private val Frames = 65

  private def ascii(p: Array[Byte], off: Int, s: String): Boolean =
    p.length >= off + s.length &&
      s.indices.forall(i => p(off + i) == s.charAt(i).toByte)

  /** The fingerprint core; public + static-shaped so generated code can
    * call it directly (one invocation per row inside codegen). */
  def compute(p: Array[Byte]): InternalRow = {
    def zero = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](0L, 0L))
    if (!ascii(p, 0, "RIFF") || !ascii(p, 8, "WAVE")) return zero
    // RIFF chunk walk to `data` (odd chunk sizes carry a pad byte)
    var off = 12L
    var dataOff = -1L
    var dataLen = 0L
    while (dataOff < 0 && off + 8 <= p.length) {
      val size = ((p(off.toInt + 4) & 0xffL)) |
        ((p(off.toInt + 5) & 0xffL) << 8) |
        ((p(off.toInt + 6) & 0xffL) << 16) |
        ((p(off.toInt + 7) & 0xffL) << 24)
      if (ascii(p, off.toInt, "data")) {
        dataOff = off + 8
        dataLen = math.min(size, p.length - dataOff)
      } else off += 8 + size + (size & 1)
    }
    if (dataOff < 0 || dataLen < 2) return zero
    val n = dataLen / 2 // 16-bit samples, channel-agnostic sample stream
    val energy = new Array[Long](Frames)
    var f = 0
    while (f < Frames) {
      // INTEGER frame boundaries (i·n/65) — exact in any engine
      var j = f * n / Frames
      val end = (f + 1) * n / Frames
      var e = 0L
      while (j < end) {
        val o = (dataOff + 2 * j).toInt
        val v = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
        val s = if (v >= 32768) v - 65536 else v
        e += s.toLong * s
        j += 1
      }
      energy(f) = e
      f += 1
    }
    def half(base: Int): Long = {
      var s = 0L
      var i = 0
      while (i < 32) {
        if (energy(base + i + 1) > energy(base + i)) s += 1L << (31 - i)
        i += 1
      }
      s
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](half(0), half(32)))
  }

  /** Column-API form: `wavHash(col("payload"))` → struct(hi, lo). */
  def wavHash(payload: Column): Column =
    Bridge.column(WavEnergyHash(Bridge.expression(payload)))
}
