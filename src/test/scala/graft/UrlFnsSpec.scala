package graft

import org.apache.spark.sql.functions._
import graft.functions.UrlFns

/** Canonicalization rules pinned on hand cases — one per rule plus the
  * compositions, so an extraction-regex change cannot silently shift
  * the dedup key.
  */
class UrlFnsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlFns.canonicalUrl(col("u"))).collect()
      .map(_.getString(0)).toSeq

  test("scheme and host lowercase; www dropped; fragment gone") {
    assert(canon("HTTPS://WWW.Example.COM/a#frag") ===
      Seq("https://example.com/a"))
  }

  test("default ports vanish per scheme; explicit ports survive") {
    assert(canon(
      "http://h.com:80/a", "https://h.com:443/a",
      "http://h.com:443/a", "https://h.com:8080/a") === Seq(
      "http://h.com/a", "https://h.com/a",
      "http://h.com:443/a", "https://h.com:8080/a"))
  }

  test("trailing slashes stripped; root and absent path become /") {
    assert(canon(
      "http://h.com/a/b/", "http://h.com/a//", "http://h.com/",
      "http://h.com") === Seq(
      "http://h.com/a/b", "http://h.com/a", "http://h.com/", "http://h.com/"))
  }

  test("query params sorted, utm_* and empty segments dropped, emptied query loses ?") {
    assert(canon(
      "http://h.com/a?b=2&a=1",
      "http://h.com/a?a=1&b=2",
      "http://h.com/a?b=2&utm_source=x&a=1",
      "http://h.com/a?utm_campaign=y",
      "http://h.com/a?&&b=1") === Seq(
      "http://h.com/a?a=1&b=2",
      "http://h.com/a?a=1&b=2",
      "http://h.com/a?a=1&b=2",
      "http://h.com/a",
      "http://h.com/a?b=1"))
  }

  test("equivalent spellings collapse to one key; distinct URLs stay distinct") {
    val variants = Seq(
      "http://www.Site7.example.com:80/p/3/?b=2&a=1&utm_source=x#top",
      "HTTP://site7.EXAMPLE.com/p/3?a=1&b=2")
    assert(canon(variants: _*).distinct.size === 1)
    val different = Seq(
      "http://site7.example.com/p/3?a=1&b=2",
      "http://site7.example.com/p/3?a=1&b=3",
      "https://site7.example.com/p/3?a=1&b=2",
      "http://site8.example.com/p/3?a=1&b=2")
    assert(canon(different: _*).distinct.size === 4)
  }

  test("canonicalHost strips www, port, and case — keeps subdomains") {
    val hosts = Seq("https://WWW.a.B.com:8443/x", "http://sub.site.org/y")
      .toDF("u").select(UrlFns.canonicalHost(col("u"))).collect()
      .map(_.getString(0)).toSeq
    assert(hosts === Seq("a.b.com", "sub.site.org"))
  }
}
