package graft.ops

import graft.kernel.TextKernel
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-quality analysis operators for training-data curation.
  * Everything except language-ID is pure column expressions (codegen'd,
  * oracle-expressible); language-ID wraps the kernel heuristic.
  */
object TextStats {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => length(t) > 0)).cast("long")

  /** BPE-ish token estimate: word pieces + standalone punctuation
    * (regexp count of `\w+|[^\w\s]`).
    */
  def bpeishTokenCount(text: Column): Column =
    (size(split(text, "\\w+|[^\\w\\s]")) - 1).cast("long")

  /** Punctuation-to-character ratio. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double")
        / length(text).cast("double"))

  /** Fraction of tokens that are English stopwords (quality signal). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = filter(split(lower(text), "\\s+"), t => length(t) > 0)
    when(size(toks) === 0, 0.0).otherwise(
      size(filter(toks, t => t.isin(stopwords.map(lit): _*)))
        .cast("double") / size(toks).cast("double"))
  }

  /** Mean word length. */
  def meanWordLen(text: Column): Column = {
    val toks = filter(split(text, "\\s+"), t => length(t) > 0)
    when(size(toks) === 0, 0.0).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long")).cast("double")
        / size(toks).cast("double"))
  }

  private val langIdUdf = udf((text: String) =>
    if (text == null) null else TextKernel.langId(text))

  /** Heuristic language-ID (stopword profiles + CJK script share). */
  def langId(text: Column): Column = langIdUdf(text)

  /** Composite quality report per document. */
  def qualityReport(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val en = Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "a", "with")
    docs.select(
      col(idCol).as("doc_id"),
      length(col(textCol)).cast("long").as("n_chars"),
      tokenCount(col(textCol)).as("n_tokens"),
      bpeishTokenCount(col(textCol)).as("n_bpeish"),
      punctRatio(col(textCol)).as("punct_ratio"),
      stopwordRatio(col(textCol), en).as("stopword_ratio"),
      meanWordLen(col(textCol)).as("mean_word_len"),
      langId(col(textCol)).as("lang_pred"))
  }
}
