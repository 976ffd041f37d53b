package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UrlFnsSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(UrlFns.canonical(col("u"))).collect()
      .map(_.getString(0)).toSeq
  }

  test("scheme and host lowercase; path case preserved") {
    assert(canon("HTTPS://WWW.Example.COM/Path/File") ==
      Seq("https://example.com/Path/File"))
  }

  test("default ports dropped, explicit non-default ports kept") {
    assert(canon(
      "https://a.com:443/x", "http://a.com:80/x",
      "https://a.com:80/x", "http://a.com:8080/x") ==
      Seq("https://a.com/x", "http://a.com/x",
        "https://a.com:80/x", "http://a.com:8080/x"))
  }

  test("fragments dropped; empty path becomes /") {
    assert(canon("https://a.com#frag", "https://a.com/p#x?notaquery") ==
      Seq("https://a.com/", "https://a.com/p"))
  }

  test("tracking params removed, survivors sorted bytewise") {
    assert(canon(
      "https://a.com/p?utm_source=x&b=2&a=1",
      "https://a.com/p?gclid=1&fbclid=2&ref=3&z=9",
      "https://a.com/p?utm_campaign=c&utm_medium=m") ==
      Seq("https://a.com/p?a=1&b=2",
        "https://a.com/p?z=9",
        "https://a.com/p"))
  }

  test("www stripped; all rules compose on a messy real-world shape") {
    assert(canon("HTTP://WWW.News.Site.ORG:80/A/b/C?utm_x=1&q=spark&page=2#top")
      == Seq("http://news.site.org/A/b/C?page=2&q=spark"))
  }

  test("idempotence: canonicalizing a canonical URL is a no-op") {
    import spark.implicits._
    val messy = Seq(
      "HTTPS://WWW.Example.COM:443/Path?utm_source=a&b=2&a=1#f",
      "http://site.org:8080/", "https://a.com?z=1&y=2")
    val once = canon(messy: _*)
    assert(canon(once: _*) == once)
  }

  test("component extractors on fixtures") {
    import spark.implicits._
    val r = Seq("HTTPS://WWW.Ex.COM:8443/p/q?a=1#z").toDF("u")
      .select(UrlFns.scheme(col("u")), UrlFns.host(col("u")),
        UrlFns.port(col("u")), UrlFns.path(col("u")), UrlFns.query(col("u")))
      .collect().head
    assert(r.toSeq == Seq("https", "ex.com", "8443", "/p/q", "a=1"))
  }
}
