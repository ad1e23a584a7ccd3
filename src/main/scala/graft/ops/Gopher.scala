package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher / MassiveText document-quality rules (Rae et al., "Scaling
  * Language Models: Methods, Analysis & Insights from Training Gopher",
  * 2021, Appendix A1.1) — the public rule set every large-scale text
  * curation pipeline since has reused (RedPajama, Dolma, FineWeb):
  * repetition signals (duplicate lines, top-n-gram character mass) plus
  * line-shape and word-shape gates, combined into keep/fail_reasons.
  *
  * Complements [[TextAnalysis.qualityFilter]] (word-count / word-length /
  * symbol / stopword bounds — the C4-ish half) with the signals Gopher
  * added: WITHIN-document repetition measured in characters, and
  * bullet/ellipsis line structure.
  *
  * Scale shape: one row-local projection per document — no explode, no
  * join, zero exchanges (GopherSpec pins it). The repetition counting is
  * the fused native [[graft.functions.GopherSignals]] expression (O(n)
  * hash-map counting in one JVM pass; the composable
  * filter-per-distinct-gram spelling measured 9+ minutes at sf0.01 —
  * O(distinct·n) interpreted string comparisons per document per n). */
object Gopher {

  private def wordsOf(text: Column): Column =
    split(trim(text), TextAnalysis.wsPlus)

  // the derived fraction columns over a GopherSignals struct `g`
  private def dupLineFrac(g: Column): Column =
    g.getField("dup_n").cast("double") / g.getField("n_lines")
  private def dupLineCharFrac(g: Column): Column =
    g.getField("dup_chars").cast("double") /
      greatest(g.getField("line_chars"), lit(1L))

  /** Per-document repetition signals: (doc_id, n_lines, dup_line_frac,
    * dup_line_char_frac, top{2,3,4}gram_char_frac). `lines` are fixed
    * `lineWords`-word blocks — deterministic and oracle-replayable; a
    * crawl pipeline passes real extracted lines ([[Extract.textLines]])
    * through the same counting. A line/gram occurrence AFTER THE FIRST
    * counts as duplicate, in both lines and characters (the
    * RedPajama/NeMo reading of Gopher's "fraction of characters in
    * duplicate lines"). */
  def repetitionSignals(docs: DataFrame, lineWords: Int = 12): DataFrame =
    docs
      .filter(col("text").isNotNull && size(wordsOf(col("text"))) >= 1)
      .withColumn("_g",
        graft.functions.GopherSignals.signals(wordsOf(col("text")), lineWords))
      .select(col("doc_id"),
        col("_g.n_lines").as("n_lines"),
        dupLineFrac(col("_g")).as("dup_line_frac"),
        dupLineCharFrac(col("_g")).as("dup_line_char_frac"),
        col("_g.top2").as("top2gram_char_frac"),
        col("_g.top3").as("top3gram_char_frac"),
        col("_g.top4").as("top4gram_char_frac"))

  /** The Gopher quality gate: word/line-shape rules (A1.1) + the
    * repetition thresholds, each failed rule named in `fail_reasons`.
    * Thresholds are the paper's: 50–100,000 words; mean word length
    * 3–10; ≥80% of words contain an alphabetic character; ≥2 distinct
    * members of the 8-stopword set; ≤30% of lines end in an ellipsis;
    * ≤90% of lines start with a bullet; dup_line_frac ≤0.30,
    * dup_line_char_frac ≤0.20, top-{2,3,4}-gram character fractions
    * ≤{0.20, 0.18, 0.16}. One projection — signals derived in place, no
    * self-join. */
  def qualityGate(docs: DataFrame, lineWords: Int = 12): DataFrame = {
    val stopSet = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val ws = col("_ws")
    val nw = size(ws)
    val nl = col("_g").getField("n_lines")
    val meanLen = length(array_join(ws, "")).cast("double") / nw
    val alphaFrac = size(filter(ws, w => w.rlike("[A-Za-z]")))
      .cast("double") / nw
    val nStops = size(array_intersect(ws, array(stopSet.map(lit): _*)))
    // line-shape rules need the line STRINGS (cheap O(n) transforms, not
    // the counting loop) — derive the blocks once here
    val lines = transform(
      sequence(lit(0), nl - 1),
      i => array_join(slice(ws, i * lineWords + 1, lit(lineWords)), " "))
    val ellipsisFrac = size(filter(col("_lines"),
      l => l.endsWith("...") || l.endsWith("…"))).cast("double") / nl
    val bulletFrac = size(filter(col("_lines"),
      l => l.startsWith("-") || l.startsWith("*") || l.startsWith("•")))
      .cast("double") / nl
    val reasons = concat_ws(",",
      when(nw < 50, "too_few_words"),
      when(nw > 100000, "too_many_words"),
      when(meanLen < 3.0, "short_words"),
      when(meanLen > 10.0, "long_words"),
      when(alphaFrac < 0.8, "non_alpha_words"),
      when(nStops < 2, "too_few_stopwords"),
      when(ellipsisFrac > 0.3, "ellipsis_lines"),
      when(bulletFrac > 0.9, "bullet_lines"),
      when(dupLineFrac(col("_g")) > 0.3, "dup_lines"),
      when(dupLineCharFrac(col("_g")) > 0.2, "dup_line_chars"),
      when(col("_g.top2") > 0.20, "top2gram"),
      when(col("_g.top3") > 0.18, "top3gram"),
      when(col("_g.top4") > 0.16, "top4gram"))
    docs
      .filter(col("text").isNotNull && size(wordsOf(col("text"))) >= 1)
      .withColumn("_ws", wordsOf(col("text")))
      .withColumn("_g",
        graft.functions.GopherSignals.signals(col("_ws"), lineWords))
      .withColumn("_lines", lines)
      .select(col("doc_id"), (reasons === "").as("keep"),
        reasons.as("fail_reasons"))
  }
}
