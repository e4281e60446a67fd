package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class UrlOpsSpec extends AnyFlatSpec with Matchers with SparkSpec {

  private def canon(urls: String*): Seq[Option[String]] = {
    import spark.implicits._
    urls.toDF("url")
      .select(UrlOps.canonicalizeUrl(col("url")).as("c"))
      .collect().toSeq.map(r => Option(r.getString(0)))
  }

  behavior of "UrlOps.canonicalizeUrl"

  it should "lower-case scheme and host, strip the default port, drop the fragment" in {
    canon("HTTPS://Site3.Example.COM:443/doc/7?utm_source=feed&b=2&a=1#frag") shouldBe
      Seq(Some("https://site3.example.com/doc/7?a=1&b=2"))
  }

  it should "strip :80 only for http and :443 only for https" in {
    canon(
      "http://a.com:80/x",
      "https://a.com:443/x",
      "http://a.com:443/x",
      "https://a.com:80/x",
      "http://a.com:8080/x") shouldBe Seq(
      Some("http://a.com/x"),
      Some("https://a.com/x"),
      Some("http://a.com:443/x"),
      Some("https://a.com:80/x"),
      Some("http://a.com:8080/x"))
  }

  it should "sort surviving query params and drop tracking params" in {
    canon("https://a.com/p?z=9&a=1&fbclid=abc&utm_campaign=x&m=5") shouldBe
      Seq(Some("https://a.com/p?a=1&m=5&z=9"))
  }

  it should "omit the ? when only tracking params were present" in {
    canon("https://a.com/p?utm_source=x&gclid=1") shouldBe
      Seq(Some("https://a.com/p"))
  }

  it should "normalize an empty path to /" in {
    canon("https://a.com", "https://a.com?b=1") shouldBe
      Seq(Some("https://a.com/"), Some("https://a.com/?b=1"))
  }

  it should "keep params whose name merely starts with a tracking prefix substring" in {
    // 'reference=1' must survive the ^ref$ rule; 'ref=1' must not
    canon("https://a.com/p?reference=1&ref=2") shouldBe
      Seq(Some("https://a.com/p?reference=1"))
  }

  it should "return null for a string with no parseable scheme or authority" in {
    canon("not a url", "/relative/path") shouldBe Seq(None, None)
  }

  it should "be idempotent" in {
    import spark.implicits._
    val messy = Seq(
      "HTTPS://Site3.Example.COM:443/doc/7?utm_source=feed&b=2&a=1#frag",
      "http://a.com:80/x?z=1&a=2",
      "https://a.com")
    val once = messy.toDF("url")
      .select(UrlOps.canonicalizeUrl(col("url")).as("url"))
    val twice = once.select(UrlOps.canonicalizeUrl(col("url")).as("url"))
    once.collect().toSeq shouldBe twice.collect().toSeq
  }
}
