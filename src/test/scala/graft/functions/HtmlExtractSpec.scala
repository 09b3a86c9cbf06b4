package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class HtmlExtractSpec extends SparkSpecBase {
  import spark.implicits._

  private def extract(html: String): (String, String) = {
    val r = HtmlExtract.extract(Seq((1L, html)).toDF("id", "html"), "html")
      .select($"title", $"html").head()
    (r.getString(0), r.getString(1))
  }

  test("script, style, and comment bodies never leak into the text") {
    val (_, text) = extract(
      "<html><head><style>p { color: red }</style></head><body>" +
        "<script>if (1 < 2) { alert('x < y'); }</script>" +
        "<!-- hidden note -->visible</body></html>")
    assert(text == "visible")
    assert(!text.contains("alert") && !text.contains("color") &&
      !text.contains("hidden"))
  }

  test("block-closing tags become line boundaries; inline tags become spaces") {
    val (_, text) = extract(
      "<body><h1>Title</h1><p>one <b>bold</b> word</p><p>two</p></body>")
    assert(text == "Title\none bold word\ntwo")
  }

  test("common entities decode; title extracts raw") {
    val (title, text) = extract(
      "<html><head><title>A &amp; B</title></head>" +
        "<body><p>&quot;x&quot; &lt;tag&gt; a&nbsp;b &#39;s</p></body></html>")
    assert(title == "A &amp; B", "title is the raw <title> content")
    assert(text.endsWith("\"x\" <tag> a b 's"))
  }

  test("whitespace normalizes: space runs collapse, blank-line runs squeeze") {
    val (_, text) = extract(
      "<body><p>a    b</p><br><br><br><br><p>c</p></body>")
    assert(text == "a b\n\nc")
  }

  test("documents without a title get an empty title, not a crash") {
    val (title, text) = extract("<body><p>plain</p></body>")
    assert(title == "" && text == "plain")
  }

  test("extraction is pure codegen: no UDF, no shuffle") {
    val plan = HtmlExtract.extract(
        tbl("documents").select($"doc_id", $"text".as("html")), "html")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("ScalaUDF") &&
      !plan.contains("BatchEvalPython"),
      s"extraction must stay a codegen projection:\n$plan")
  }
}
