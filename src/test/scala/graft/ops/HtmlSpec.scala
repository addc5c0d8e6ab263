package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HtmlSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private val page =
    """<html><head><title>T</title><style>p { a: b }</style>
      |<script>if (1 < 2) { alert("&amp;"); }</script></head>
      |<body><h1>Hello</h1><!-- note --><p>Q&amp;A &lt;tags&gt; &quot;x&quot; &#39;y&#39;&nbsp;end</p></body></html>""".stripMargin

  private val want = "T Hello Q&A <tags> \"x\" 'y' end"

  test("htmlToText: scripts/styles/comments/tags stripped, entities decoded, ws collapsed") {
    import spark.implicits._
    val got = Seq(page).toDF("h").select(Html.htmlToText(col("h"))).head.getString(0)
    assert(got == want)
  }

  test("html_to_text SQL registration matches the Column API") {
    import spark.implicits._
    graft.functions.MiintRegistry.registerAll(spark)
    Seq(page).toDF("h").createOrReplaceTempView("html_spec")
    val got = spark.sql("SELECT html_to_text(h) FROM html_spec").head.getString(0)
    assert(got == want)
    // double-encoded entity decodes ONE level (amp runs last)
    val dbl = spark.sql("SELECT html_to_text('&amp;lt;')").head.getString(0)
    assert(dbl == "&lt;")
  }

  test("malformed nesting degrades to tag stripping, never throws") {
    import spark.implicits._
    val bad = "<p>unclosed <b>bold <script>x<p>trailing"
    val got = Seq(bad).toDF("h").select(Html.htmlToText(col("h"))).head.getString(0)
    assert(got == "unclosed bold x trailing")
  }
}
