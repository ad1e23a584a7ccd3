package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation (SURVEY.md §2.5):
  * quality stats, token counting, language ID, document fingerprinting.
  * All pure per-row Catalyst expressions — they fuse into the scan and
  * shuffle nothing.
  */
object TextAnalysis {

  /** BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation. */
  val tokenPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  def textStats(docs: DataFrame): DataFrame = {
    val w = split(trim(col("text")), "\\s+")
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      size(w).cast("long").as("n_words"),
      size(array_distinct(w)).cast("long").as("n_distinct_words"),
      (length(regexp_replace(col("text"), "\\s", "")).cast("double") / size(w))
        .as("avg_word_len"),
      (size(filter(w, x => x.isin("the", "a", "of", "and"))).cast("double") / size(w))
        .as("stopword_ratio"),
      // Column API, not expr(): the SQL lexer would eat the \s escape and
      // turn the char class into [^a-zA-Z0-9s] (counting whitespace runs).
      size(regexp_extract_all(col("text"), lit(tokenPattern), lit(0))).cast("long")
        .as("bpe_tokens"))
  }

  /** Heuristic language ID by stopword evidence, argmax over languages with
    * a fixed preference order on ties (en > fr > de > es). */
  def langId(docs: DataFrame): DataFrame = {
    val w = split(trim(col("text")), "\\s+")
    def hits(stops: Seq[String]): Column =
      size(filter(w, x => x.isin(stops: _*)))
    val en = hits(Seq("the", "a", "of", "and", "is"))
    val fr = hits(Seq("le", "la", "les", "et", "est"))
    val de = hits(Seq("der", "die", "das", "und", "ist"))
    val es = hits(Seq("el", "los", "las", "y", "es"))
    docs.select(col("doc_id"),
      when(en >= fr && en >= de && en >= es, "en")
        .when(fr >= de && fr >= es, "fr")
        .when(de >= es, "de")
        .otherwise("es").as("lang_guess"))
  }

  /** Canonical-form fingerprint: md5 over lowercased, whitespace-collapsed
    * text. Equal fingerprints ⇒ same normalized content. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fingerprint"))
}
