package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native fused Gopher repetition signals over a document's word array —
  * (n_lines, dup_n, dup_chars, top2/top3/top4 n-gram character
  * fractions), the hot loop of [[graft.ops.Gopher]].
  *
  * Why native: the composable spelling counts occurrences with
  * `filter(grams, _ === g)` per DISTINCT gram — O(distinct·n) interpreted
  * string comparisons per document per n (measured: 9+ minutes for two
  * queries at sf0.01). One JVM pass with hash-map counting is O(n) per
  * document and runs inside whole-stage codegen — the
  * [[ShingleHashes]]/[[BmpDHash]] pattern.
  *
  * Exact semantics (shared with the DuckDB oracle replay):
  *  - lines are fixed `lineWords`-word blocks, space-joined (line_chars
  *    = their total length, the dup-char-fraction denominator);
  *  - dup_n = Σ over distinct lines of (count−1); dup_chars the same
  *    weighted by line length — occurrences after the first are the
  *    duplicates;
  *  - top-n fraction = cmax·lmax / max(totalChars, 1), where cmax is the
  *    max n-gram count, lmax the LONGEST gram among max-count grams
  *    (the deterministic tie-break), totalChars the length of the
  *    space-joined word stream;
  *  - all lengths are code-point counts (Spark `length()` semantics,
  *    ASCII-equal to DuckDB's). */
case class GopherSignals(child: Expression, lineWords: Int)
  extends UnaryExpression {

  override def dataType: DataType = GopherSignals.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gopher_signals"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${t.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    GopherSignals.compute(input.asInstanceOf[ArrayData], lineWords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GopherSignals.compute($c, $lineWords);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GopherSignals {
  val schema: StructType = StructType(Seq(
    StructField("n_lines", IntegerType, nullable = false),
    StructField("dup_n", LongType, nullable = false),
    StructField("dup_chars", LongType, nullable = false),
    StructField("line_chars", LongType, nullable = false),
    StructField("top2", DoubleType, nullable = false),
    StructField("top3", DoubleType, nullable = false),
    StructField("top4", DoubleType, nullable = false)))

  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  def compute(arr: ArrayData, lineWords: Int): InternalRow = {
    val n = arr.numElements()
    val ws = new Array[String](n)
    var i = 0
    while (i < n) { ws(i) = arr.getUTF8String(i).toString; i += 1 }

    val nLines = math.ceil(n.toDouble / lineWords).toInt
    val counts = new java.util.HashMap[String, Int]()
    var dupN = 0L
    var dupChars = 0L
    i = 0
    val sb = new java.lang.StringBuilder
    val lineArr = new Array[String](nLines)
    while (i < nLines) {
      sb.setLength(0)
      var j = i * lineWords
      val end = math.min(j + lineWords, n)
      while (j < end) {
        if (j > i * lineWords) sb.append(' ')
        sb.append(ws(j)); j += 1
      }
      lineArr(i) = sb.toString
      counts.merge(lineArr(i), 1, Integer.sum)
      i += 1
    }
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue > 1) {
        dupN += e.getValue - 1
        dupChars += (e.getValue - 1).toLong * cpLen(e.getKey)
      }
    }

    var lineChars = 0L
    i = 0
    while (i < nLines) { lineChars += cpLen(lineArr(i)); i += 1 }

    // total chars of the space-joined word stream
    var totalChars = if (n > 0) n - 1 else 0
    i = 0
    while (i < n) { totalChars += cpLen(ws(i)); i += 1 }

    def top(g: Int): Double = {
      if (n < g) return 0.0
      val m = new java.util.HashMap[String, Int]()
      var k = 0
      while (k <= n - g) {
        sb.setLength(0)
        var j = k
        while (j < k + g) {
          if (j > k) sb.append(' ')
          sb.append(ws(j)); j += 1
        }
        m.merge(sb.toString, 1, Integer.sum)
        k += 1
      }
      var cmax = 0
      val it1 = m.entrySet().iterator()
      while (it1.hasNext) {
        val c = it1.next().getValue
        if (c > cmax) cmax = c
      }
      var lmax = 0
      val it2 = m.entrySet().iterator()
      while (it2.hasNext) {
        val e = it2.next()
        if (e.getValue == cmax) {
          val l = cpLen(e.getKey)
          if (l > lmax) lmax = l
        }
      }
      cmax.toDouble * lmax / math.max(totalChars, 1)
    }

    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nLines, dupN, dupChars, lineChars, top(2), top(3), top(4)))
  }

  /** Column-API form. */
  def signals(wordsCol: Column, lineWords: Int = 12): Column =
    Bridge.column(GopherSignals(Bridge.expression(wordsCol), lineWords))
}
