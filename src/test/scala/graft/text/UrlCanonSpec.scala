package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Canonicalization pins: every documented rule on a hand-built URL
  * zoo, plus the rules that must NOT fire (non-default ports kept,
  * scheme not folded, non-tracking params kept, mid-path slashes
  * kept).
  */
class UrlCanonSpec extends SparkSpec {

  private def canonOf(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("url").select(UrlOps.canonicalize(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("recrawl variants collapse to one canonical key") {
    val c = canonOf(
      "https://web.com/page/3?a=1&b=2",
      "HTTPS://WEB.com:443/page/3?b=2&a=1#frag",
      "https://www.web.com/page/3/?a=1&b=2&utm_source=x",
      "https://web.com:443/page/3?b=2&utm_campaign=y&a=1",
      "https://web.com/page/3/?gclid=abc123&a=1&b=2")
    assert(c.distinct === Seq("https://web.com/page/3?a=1&b=2"))
  }

  test("scheme is preserved, not folded") {
    val Seq(http, https) = canonOf(
      "http://web.com:80/page/3?a=1&b=2",
      "https://web.com/page/3?a=1&b=2")
    assert(http === "http://web.com/page/3?a=1&b=2")
    assert(http !== https)
  }

  test("non-default ports and non-tracking params survive") {
    val Seq(c) = canonOf("https://web.com:8443/x?ref2=keep&a=1")
    assert(c === "https://web.com:8443/x?a=1&ref2=keep")
  }

  test("bare ref and msclkid are stripped; empty query drops the '?'") {
    val Seq(c) = canonOf("https://web.com/x?ref=hn&msclkid=77")
    assert(c === "https://web.com/x")
  }

  test("mid-path slashes kept, only trailing run stripped; root collapses") {
    val Seq(a, b) = canonOf(
      "https://web.com/a//b///",
      "https://web.com/")
    assert(a === "https://web.com/a//b")
    assert(b === "https://web.com")
  }

  test("www is a prefix rule, not a substring rule") {
    val Seq(c) = canonOf("https://wwwx.web.com/p")
    assert(c === "https://wwwx.web.com/p")
  }
}
