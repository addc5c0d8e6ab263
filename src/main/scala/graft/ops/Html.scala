package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction (boilerplate stripping) as a pure COLUMN
  * EXPRESSION chain — no UDF, so the whole transform stays inside
  * whole-stage codegen and is expressible verbatim in the DuckDB
  * oracle (same regex chain, RE2-compatible: no backreferences, inline
  * (?is) flags). The web-ingest counterpart of the curation gates: a
  * crawl pipeline runs warc scan → html_to_text → quality/dedup.
  *
  * Steps: script blocks → style blocks → comments → all tags → the
  * five ubiquitous named entities (amp LAST, so `&amp;lt;` decodes to
  * the literal `&lt;` and not `<`) → whitespace collapse + trim.
  * Deliberately not a browser: malformed nesting degrades to tag
  * stripping, which is the curation-grade contract (Gopher/C4 pipelines
  * do the same).
  */
object Html {

  /** The (pattern, replacement) chain, shared with the oracle builder
    * so both engines provably run the same transform.
    */
  val Steps: Seq[(String, String)] = Seq(
    "(?is)<script[^>]*>.*?</script>" -> " ",
    "(?is)<style[^>]*>.*?</style>" -> " ",
    "(?s)<!--.*?-->" -> " ",
    "<[^>]*>" -> " ",
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&#39;" -> "'",
    "&nbsp;" -> " ",
    "&amp;" -> "&",
    "\\s+" -> " ")

  /** The production column: one kernel pass per document
    * ([[graft.kernel.HtmlKernel.htmlToText]], r15) instead of 11
    * sequential regexp_replace passes — the chain was the measured
    * residual of the WARC ingest rows (~60–76 task-sec at the x19
    * bench point). Output is pinned bit-identical to
    * [[htmlToTextExpr]] by HtmlKernelSpec (per-pass regex equality on
    * adversarial + randomized inputs) and by the l84 oracle row, which
    * re-derives the full chain in DuckDB from the same [[Steps]].
    */
  def htmlToText(html: Column): Column = {
    val u = udf((s: String) => graft.kernel.HtmlKernel.htmlToText(s))
    u(html)
  }

  /** The original expression-chain form — kept as the spec/oracle
    * reference twin of [[htmlToText]].
    */
  def htmlToTextExpr(html: Column): Column =
    trim(Steps.foldLeft(html) { case (c, (pat, rep)) =>
      regexp_replace(c, pat, rep)
    })

  /** The identical chain as DuckDB SQL over `expr` (regexp_replace with
    * the 'g' flag; same patterns — RE2 accepts the inline flags).
    * DuckDB single-quoted literals treat backslash literally, so the
    * patterns embed verbatim; only quotes need doubling.
    */
  def htmlToTextSql(expr: String): String = {
    val chained = Steps.foldLeft(expr) { case (e, (pat, rep)) =>
      val p = pat.replace("'", "''")
      val r = rep.replace("'", "''")
      s"regexp_replace($e, '$p', '$r', 'g')"
    }
    s"trim($chained)"
  }
}
