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
}
