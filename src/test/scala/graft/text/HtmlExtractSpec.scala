package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(HtmlExtract.htmlToText($"h")).as[String].head()

  behavior of "htmlToText"

  it should "strip tags and collapse whitespace" in {
    extract("<html><body><h1>Hello</h1>\n  <p>wide   world</p></body></html>") shouldBe
      "Hello wide world"
  }

  it should "strip script and style CONTENT, not just the tags" in {
    extract("""<script>var a = 1; if (a > 0) { emit("<p>leak</p>"); }</script>ok""") shouldBe "ok"
    extract("""<style>.a > .b { color: red }</style>ok""") shouldBe "ok"
    // attributes on the open tag don't break the pair match
    extract("""<script type="text/javascript" async>leak()</script>ok""") shouldBe "ok"
  }

  it should "remove comments before scripts so commented-out scripts can't arm the stripper" in {
    // if comments were stripped after scripts, the <script> inside the
    // comment would pair with </script> and swallow "keep"
    extract("<!-- <script> -->keep<script>drop()</script>") shouldBe "keep"
    extract("<!-- multi\nline <b>markup</b> -->keep") shouldBe "keep"
  }

  it should "decode the common entities exactly once" in {
    extract("<p>a &lt;b&gt; &quot;c&quot; &#39;d&#39; &apos;e&apos;</p>") shouldBe
      "a <b> \"c\" 'd' 'e'"
    // &amp; decoded LAST: &amp;lt; is the TEXT "&lt;", not a second-pass "<"
    extract("<p>&amp;lt;</p>") shouldBe "&lt;"
    extract("<p>a&amp;b</p>") shouldBe "a&b"
  }

  it should "turn &nbsp; into collapsible whitespace" in {
    extract("<p>a&nbsp;&nbsp;b</p>") shouldBe "a b"
  }

  it should "separate words glued by adjacent tags" in {
    extract("<h1>one</h1><p>two</p>") shouldBe "one two"
  }

  it should "be null-safe and empty-safe" in {
    Seq[Option[String]](None).toDF("h")
      .select(HtmlExtract.htmlToText($"h")).as[Option[String]].head() shouldBe None
    extract("") shouldBe ""
    extract("plain text, no markup") shouldBe "plain text, no markup"
  }

  it should "document the quoted-'>' limitation: a literal > in an attribute ends the tag early" in {
    // regex tag stripping, not an HTML5 parser — the remainder of the
    // tag leaks as text. Pinned so a future change is a conscious one.
    extract("""<a href="a>b">x</a>""") shouldBe "b\">x"
  }

  behavior of "htmlTitle"

  it should "extract and collapse the title, empty when absent" in {
    val df = Seq(
      "<head><title>One\n  Two</title></head>",
      "<head><TITLE lang=\"en\">Up</TITLE></head>",
      "<head></head>").toDF("h")
    df.select(HtmlExtract.htmlTitle($"h")).as[String].collect() shouldBe
      Array("One Two", "Up", "")
  }

  behavior of "linkCount"

  it should "count anchor opens case-insensitively without counting </a> or <abbr>" in {
    val df = Seq("<a href=x>1</a><A href=y>2</A><abbr>no</abbr><p>none</p>").toDF("h")
    df.select(HtmlExtract.linkCount($"h")).as[Int].head() shouldBe 2
  }

  behavior of "links"

  private def hrefs(html: String): Seq[String] =
    Seq(html).toDF("h").select(HtmlExtract.links($"h")).as[Seq[String]].head()

  it should "extract hrefs in document order from both quote styles" in {
    hrefs("""<a href="http://a/1">x</a><p>mid</p><A HREF='http://b/2'>y</A>""") shouldBe
      Seq("http://a/1", "http://b/2")
  }

  it should "ignore link/base tags and href-less anchors" in {
    hrefs("""<link rel="stylesheet" href="/css"><base href="http://base/">""" +
      """<a name="top"></a><a class="l" href="http://real/">r</a>""") shouldBe
      Seq("http://real/")
  }

  it should "tolerate whitespace around = and attributes before href" in {
    hrefs("""<a id="z" data-x="1" href = "http://w/">x</a>""") shouldBe Seq("http://w/")
  }

  it should "stay map-side: no Exchange in the extraction plan" in {
    val plan = Seq("<p>x</p>").toDF("h")
      .select(HtmlExtract.htmlToText($"h"), HtmlExtract.htmlTitle($"h"),
        HtmlExtract.linkCount($"h"))
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }
}
