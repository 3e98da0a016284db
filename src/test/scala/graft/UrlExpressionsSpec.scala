package graft

import org.apache.spark.sql.functions._
import graft.functions.UrlExpressions

/** URL canonicalization: merge rules, conservative pass-throughs, and the
  * codegen contract (run under codegen.fallback=false).
  */
class UrlExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] = {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try urls.zipWithIndex.map { case (u, i) => (i, u) }.toDF("id", "u")
      .select(col("id"), UrlExpressions.canonicalize(spark, col("u")).as("c"))
      .orderBy("id").collect().map(_.getString(1)).toSeq
    finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  private def dom(urls: String*): Seq[Option[String]] =
    urls.zipWithIndex.map { case (u, i) => (i, u) }.toDF("id", "u")
      .select(col("id"), UrlExpressions.domain(spark, col("u")).as("d"))
      .orderBy("id").collect().map(r => Option(r.getString(1))).toSeq

  test("case, default ports, fragments, param order and tracking params all merge") {
    canon(
      "HTTP://Example.COM:80/A/b?b=2&a=1#frag",
      "http://example.com/A/b?a=1&b=2",
      "http://example.com/A/b?utm_source=x&utm_medium=y&gclid=1&b=2&a=1",
      "http://example.com/A/b/?a=1&b=2",
      "http://example.com/A/b?fbclid=z&ref=tw&msclkid=m&ref_src=t&a=1&b=2"
    ).distinct shouldBe Seq("http://example.com/A/b?a=1&b=2")
    // path CASE is preserved (paths are case-sensitive), host case is not
  }

  test("differences that matter are kept distinct") {
    canon(
      "http://example.com/a?a=1",
      "https://example.com/a?a=1",       // scheme
      "http://example.com:8080/a?a=1",   // non-default port
      "http://example.com/A?a=1",        // path case
      "http://example.com/a?a=2",        // param value
      "http://example.com/a%2Fb",        // %-escape is NOT decoded
      "http://example.com/a/b"
    ).distinct should have length 7
    // https default port still drops
    canon("HTTPS://example.com:443/x") shouldBe Seq("https://example.com/x")
  }

  test("root and trailing-slash handling") {
    canon("http://example.com", "http://example.com/", "http://example.com#f")
      .distinct shouldBe Seq("http://example.com/")
    // only ONE trailing slash drops; deeper emptiness is preserved
    canon("http://example.com/a//") shouldBe Seq("http://example.com/a/")
    // an empty query drops its '?'; all-tracking queries too
    canon("http://example.com/a?", "http://example.com/a?utm_source=x")
      .distinct shouldBe Seq("http://example.com/a")
  }

  test("conservative pass-throughs: IDN hosts, userinfo, schemeless, %-encoding case") {
    // non-ASCII host: NOT lowercased, NOT punycoded — returned re-assembled
    // but with the host byte-exact
    canon("http://Bücher.example/A b") shouldBe Seq("http://Bücher.example/A b")
    // userinfo: whole URL passes through (trimmed only)
    canon("  http://user:pw@Example.com/X?b=1&a=2  ") shouldBe
      Seq("http://user:pw@Example.com/X?b=1&a=2")
    // no scheme://authority shape: pass through
    canon("example.com/path", "mailto:a@b.c", "not a url") shouldBe
      Seq("example.com/path", "mailto:a@b.c", "not a url")
    // %-escapes keep their hex case (decoding or re-casing could collide
    // distinct resources)
    canon("http://example.com/a%2fb", "http://example.com/a%2Fb")
      .distinct should have length 2
  }

  test("IPv6 and odd ports") {
    canon("http://[::1]:8080/x") shouldBe Seq("http://[::1]:8080/x")
    canon("http://[::A]/x") shouldBe Seq("http://[::a]/x") // ascii host lowercases
    // trailing colon with no digits is part of the host, not a port
    canon("http://example.com:/x") shouldBe Seq("http://example.com:/x")
  }

  test("domain extracts the canonical host; null off-shape") {
    dom("HTTP://Example.COM:80/a", "https://Sub.Site.ORG?x=1",
      "http://Bücher.example/a", "nota url") shouldBe
      Seq(Some("example.com"), Some("sub.site.org"), Some("Bücher.example"), None)
  }
}
