package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the stage a crawl-derived corpus runs BEFORE
  * any quality/dedup work (C4, RefinedWeb, Dolma all begin at raw HTML).
  * Extension scope — no reference counterpart.
  *
  * Deliberately a RULE-BASED extractor in the Pii discipline: every step
  * is a `regexp_replace`/`regexp_extract` chain inside the Java ∩ RE2
  * regular subset (no lookaround, no backreferences; `(?s)` dot-all and
  * lazy `*?` are common to both) — pure whole-stage codegen, zero
  * shuffles, linear in corpus bytes, and an external engine replays the
  * extraction byte for byte (the q108 oracle). It is NOT a DOM parser:
  * malformed nesting degrades to over-stripping, and link-density
  * boilerplate detection (jusText-class) needs a DOM — document-level
  * boilerplate is instead left to the downstream line/paragraph dedup
  * tier, which removes cross-document nav/footer repeats by counting
  * them (LineDedup), not by parsing them.
  *
  * Order matters: comments and script/style bodies go first (their
  * content must not leak into text), then block-closing tags become
  * newlines (structure → line boundaries the line-level operators use),
  * then remaining tags drop, then entities decode, then whitespace
  * normalizes.
  */
object HtmlExtract {

  /** (pattern, replacement) steps, applied in order — one source of truth
    * shared by [[text]] and the q108 oracle mirror. */
  val Steps: Seq[(String, String)] = Seq(
    "(?s)<!--.*?-->" -> " ",                        // comments
    "(?s)<script[^>]*>.*?</script>" -> " ",         // script incl. body
    "(?s)<style[^>]*>.*?</style>" -> " ",           // style incl. body
    "(?i)<(br|hr)[^>]*>" -> "\n",                   // explicit breaks
    "(?i)</(p|div|li|tr|h1|h2|h3|h4|h5|h6|blockquote)>" -> "\n", // block ends
    "(?s)<[^>]+>" -> " ",                           // every remaining tag
    "&nbsp;" -> " ", "&amp;" -> "&", "&lt;" -> "<", // common entities
    "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "[ \\t]+" -> " ",                               // collapse spaces
    " ?\\n ?" -> "\n",                              // trim around breaks
    "\\n{3,}" -> "\n\n",                            // squeeze blank runs
    "^\\s+" -> "", "\\s+$" -> "")                   // strip the text's ends
                                                    // (^/$ anchor the whole
                                                    // string: no (?m) flag)

  /** The extracted text column (trimmed). */
  def text(html: Column): Column =
    trim(Steps.foldLeft(html) { case (t, (re, repl)) =>
      regexp_replace(t, re, repl)
    })

  /** The <title> content, empty string when absent. */
  def title(html: Column): Column =
    regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1)

  /** Extract text + title for a document frame, replacing `htmlCol` with
    * the clean text (the downstream operators' input shape). */
  def extract(df: org.apache.spark.sql.DataFrame, htmlCol: String):
      org.apache.spark.sql.DataFrame =
    df.withColumn("title", title(col(htmlCol)))
      .withColumn(htmlCol, text(col(htmlCol)))

  // ---- anchor-density boilerplate scoring (jusText-lite) ----------------
  //
  // The DOM-free leg of link-density boilerplate detection: nav / footer /
  // related-links blocks are short lines whose visible characters live
  // mostly inside <a> elements, while body text is long and link-sparse
  // (Pomikálek 2011's core signal). Measured per STRUCTURAL line — after
  // comments/script/style removal and block-end → newline conversion, but
  // BEFORE tag stripping, so the <a> markup is still visible to count.
  // Everything below stays in the Java ∩ RE2 regex subset and is
  // replayable in DuckDB (the q110 oracle); the per-line pass rides
  // transform/filter HOFs — CodegenFallback, but ONE pass, linear in
  // corpus bytes, zero shuffles. In a pipeline, materialize the stage
  // output before fanning metrics over it (the q109 inlining lesson).

  /** The prefix of [[Steps]] that establishes line structure while KEEPING
    * tags: comments out, script/style bodies out, breaks and block ends →
    * newlines. One source of truth for [[lineAnchorStats]] and its oracle
    * mirror. */
  val StructuralSteps: Seq[(String, String)] = Steps.take(5)

  /** Tag-strip + whitespace-collapse for a single line fragment — the
    * "visible characters" measure shared by the numerator (anchor bodies)
    * and the denominator (whole line). */
  private def visible(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, "(?s)<[^>]+>", " "), "[ \\t]+", " "))

  /** Per-line anchor-density stats over raw html: an array of structs
    * (line_idx, n_chars, anchor_permille) where n_chars counts the line's
    * visible characters and anchor_permille = ⌊anchor_chars·1000 /
    * max(n_chars,1)⌋ counts the share of them inside <a> elements —
    * integer-exact, so an external engine reproduces it digit for digit. */
  def lineAnchorStats(html: Column): Column = {
    val structured = StructuralSteps.foldLeft(html) { case (t, (re, repl)) =>
      regexp_replace(t, re, repl)
    }
    val lines = split(structured, "\n")
    val idx = sequence(lit(0), greatest(size(lines) - 1, lit(0)))
    zip_with(idx, lines, (i, line) => {
      val vis = visible(line)
      val anchorVis = visible(
        array_join(regexp_extract_all(line, lit("(?is)<a[^>]*>(.*?)</a>"), lit(1)), " "))
      struct(
        i.as("line_idx"),
        length(vis).as("n_chars"),
        // floor(a·1000 / b) over IEEE double division is digit-exact in
        // any engine here: b ≤ line length keeps the quotient's distance
        // from the nearest integer ≥ 2⁻³¹, far above double rounding.
        floor(length(anchorVis) * lit(1000) / greatest(length(vis), lit(1)))
          .cast("int").as("anchor_permille"))
    })
  }

  /** Extract text with link-dense boilerplate lines REMOVED: structural
    * lines whose anchor share exceeds `maxAnchorPermille` are dropped
    * before tag stripping, then the remaining [[Steps]] run as usual.
    * Lines with no visible characters are kept (they collapse to blank
    * lines the whitespace rules squeeze, exactly as in [[text]]). */
  def textDropBoilerplate(html: Column, maxAnchorPermille: Int = 500): Column = {
    val structured = StructuralSteps.foldLeft(html) { case (t, (re, repl)) =>
      regexp_replace(t, re, repl)
    }
    val kept = filter(split(structured, "\n"), line => {
      val vis = visible(line)
      val anchorVis = visible(
        array_join(regexp_extract_all(line, lit("(?is)<a[^>]*>(.*?)</a>"), lit(1)), " "))
      floor(length(anchorVis) * lit(1000) / greatest(length(vis), lit(1)))
        .cast("int") <= lit(maxAnchorPermille)
    })
    trim(Steps.drop(StructuralSteps.size).foldLeft(array_join(kept, "\n")) {
      case (t, (re, repl)) => regexp_replace(t, re, repl)
    })
  }
}
