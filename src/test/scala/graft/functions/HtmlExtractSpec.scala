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

  private val linkPage =
    "<html><body>" +
      "<div class=\"nav\"><a href=\"/\">Home</a> | <a href=\"/about\">About us</a> | <a href=\"/c\">Contact</a></div>" +
      "<p>A long body paragraph about engines with a single <a href=\"/ref\">reference</a> link inside it.</p>" +
      "<div class=\"footer\"><a href=\"/tos\">Terms</a> <a href=\"/priv\">Privacy</a></div>" +
      "</body></html>"

  test("anchor density scores nav/footer lines above content lines") {
    val stats = Seq((1L, linkPage)).toDF("id", "html")
      .select(explode(HtmlExtract.lineAnchorStats($"html")).as("ls"))
      .select($"ls.line_idx", $"ls.n_chars", $"ls.anchor_permille")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
      .filter(_._2 > 0) // visible lines only
    assert(stats.size == 3, s"expected nav/body/footer lines, got $stats")
    val Seq(nav, body, footer) = stats.sortBy(_._1).toSeq
    assert(nav._3 > 700, s"nav line must be link-dense, got $nav")
    assert(footer._3 == 1000, s"footer is all-anchor, got $footer")
    assert(body._3 < 200, s"body line must be link-sparse, got $body")
    assert(nav._3 > body._3 && footer._3 > body._3)
  }

  test("textDropBoilerplate removes link-dense lines, keeps the body") {
    val text = Seq((1L, linkPage)).toDF("id", "html")
      .select(HtmlExtract.textDropBoilerplate($"html", 500).as("t"))
      .as[String].head()
    assert(text.contains("long body paragraph") && text.contains("reference"),
      s"body (with its inline link) must survive: $text")
    assert(!text.contains("Home") && !text.contains("Privacy"),
      s"nav and footer must be gone: $text")
    // threshold 1000 keeps everything — the gate, not the chain, dropped them
    val loose = Seq((1L, linkPage)).toDF("id", "html")
      .select(HtmlExtract.textDropBoilerplate($"html", 1000).as("t"))
      .as[String].head()
    assert(loose.contains("Home | About us | Contact") && loose.contains("Terms Privacy"))
  }

  test("anchor scoring shuffles nothing (per-row HOF pass)") {
    val plan = Seq((1L, linkPage)).toDF("id", "html")
      .select(HtmlExtract.lineAnchorStats($"html"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("ScalaUDF"),
      s"anchor stats must stay a per-row projection:\n$plan")
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
