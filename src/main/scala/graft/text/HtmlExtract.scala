package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the step between a web crawl's raw payloads
  * and every text operator in this library (quality gates, dedup keys,
  * token counts all assume markup-free prose).
  *
  * The extractor is a fixed chain of codegen'd builtin functions
  * (regexp_replace / replace / regexp_extract) — no UDFs, no parser
  * objects per row — so extraction runs map-side inside whole-stage
  * codegen and adds no shuffle to whatever pipeline consumes it. Every
  * pattern is written in the RE2-compatible subset of Java regex
  * (inline `(?is)` flags, non-greedy quantifiers, no backreferences) so
  * an external engine can replay the chain verbatim — the x43 oracle
  * predicts the extracted text analytically instead, which checks the
  * chain's SEMANTICS cross-engine rather than its implementation.
  *
  * Deliberate non-goals, so the contract is honest: this is regex tag
  * stripping, not an HTML5 tree parser. A literal `>` inside a quoted
  * attribute value ends the tag early (crawl pipelines accept this —
  * the byte is vanishingly rare and the damage is local); only the
  * seven ubiquitous character entities are decoded (`&amp; &lt; &gt;
  * &quot; &#39; &apos; &nbsp;` — numeric references beyond `&#39;` pass
  * through); CDATA sections are treated as text. Visual-block text
  * density (boilerpipe-style) belongs to
  * [[TextQuality.removeBoilerplate]] downstream, which operates on the
  * extracted sentences.
  */
object HtmlExtract {

  /** Comments first: a commented-out `<script>` must not arm the script
    * stripper.
    */
  private val CommentPattern = "(?s)<!--.*?-->"

  /** Script/style pairs strip CONTENT, not just tags — embedded markup
    * (`emit("<p>")`) and comparison operators inside code must not leak
    * into the text. Non-greedy to the matching close tag.
    */
  private val ScriptPattern = "(?is)<script\\b[^>]*>.*?</script\\s*>"
  private val StylePattern = "(?is)<style\\b[^>]*>.*?</style\\s*>"

  /** Any remaining tag → one space (so `</h1><p>` never glues words). */
  private val TagPattern = "<[^>]*>"

  /** Strip markup from an HTML column, yielding whitespace-collapsed
    * prose. Null in → null out. Order is load-bearing: comments before
    * scripts (see [[CommentPattern]]), entity decode before whitespace
    * collapse (`&nbsp;` becomes a collapsible space), and `&amp;` is
    * decoded LAST so `&amp;lt;` yields the literal text `&lt;` instead
    * of double-decoding to `<`.
    */
  def htmlToText(html: Column): Column = {
    val noMarkup = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(html, CommentPattern, " "),
          ScriptPattern, " "),
        StylePattern, " "),
      TagPattern, " ")
    val decoded = replace(
      replace(
        replace(
          replace(
            replace(
              replace(noMarkup, lit("&lt;"), lit("<")),
              lit("&gt;"), lit(">")),
            lit("&quot;"), lit("\"")),
          lit("&#39;"), lit("'")),
        lit("&apos;"), lit("'")),
      lit("&nbsp;"), lit(" "))
    trim(regexp_replace(replace(decoded, lit("&amp;"), lit("&")), "\\s+", " "))
  }

  /** The `<title>` text, markup-stripped and collapsed; empty string
    * when the document has none (regexp_extract's no-match value, kept
    * as-is so the column stays non-null for grouping).
    */
  def htmlTitle(html: Column): Column =
    trim(regexp_replace(
      regexp_extract(html, "(?is)<title[^>]*>(.*?)</title\\s*>", 1), "\\s+", " "))

  /** Count of anchor tags — the link-density numerator quality filters
    * use (Gopher drops pages whose text is mostly link labels).
    */
  def linkCount(html: Column): Column =
    size(regexp_extract_all(html, lit("(?i)<a\\b"), lit(0)))

  /** All outgoing hrefs, in document order — the crawl-frontier /
    * link-graph extractor (anchor targets feed PageRank-style quality
    * signals and the next fetch round). Same posture as the rest of the
    * chain: one codegen'd regexp_extract_all, double- or single-quoted
    * attribute values, whitespace tolerated around `=`, no tree parse.
    * The attribute name must follow a whitespace/quote delimiter, so
    * `data-href="X" href="Y"` extracts Y, not X (`\b` alone matches
    * after `-` or `:`). Declared non-goals: unquoted hrefs (pre-HTML4
    * relic) and anchors inside comments/`<script>` bodies — a regex
    * pass cannot see tree context, and a frontier fetch of a
    * commented-out link is wasted-but-harmless.
    */
  def links(html: Column): Column =
    regexp_extract_all(html,
      lit("(?is)<a\\b[^>]*[\\s\"']href\\s*=\\s*[\"']([^\"'>]*)[\"']"), lit(1))
}
