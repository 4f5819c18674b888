package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.UrlOps

/** URL canonicalization / URL dedup / domain-cap curation. */
class UrlOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(urls: String*): List[String] =
    urls.toList.toDF("url")
      .select(UrlOps.canonicalize($"url")).as[String].collect().toList

  test("canonicalize applies every rule") {
    assert(canon(
      // case + default port + dup slash + fragment + param sort
      "HTTPS://Ex.COM:443//a//b?b=2&a=1#frag",
      // http default port, tracking params dropped, empty param dropped
      "http://ex.com:80/x?utm_source=f&gclid=1&&z=9",
      // non-default port kept; no query
      "https://ex.com:8443/x",
      // empty path becomes /
      "http://ex.com",
      // tracking-only query drops the '?' entirely
      "https://ex.com/p?utm_campaign=c",
      // bare ref= KEPT by default (it can be content addressing —
      // ?ref=<branch> on code forges); ref_src= (the tracker) dropped
      "https://ex.com/p?ref=abc&ref_src=twsrc&refresh=1",
      // trackers match case-insensitively — hosts emit any casing
      "https://ex.com/p?UTM_SOURCE=f&Fbclid=x&z=1"
    ) == List(
      "https://ex.com/a/b?a=1&b=2",
      "http://ex.com/x?z=9",
      "https://ex.com:8443/x",
      "http://ex.com/",
      "https://ex.com/p",
      "https://ex.com/p?ref=abc&refresh=1",
      "https://ex.com/p?z=1"))
  }

  test("canonicalize with a caller-extended drop list drops bare ref") {
    val got = Seq("https://ex.com/p?ref=abc&refresh=1").toDF("url")
      .select(UrlOps.canonicalize($"url",
        UrlOps.DefaultTrackingParams :+ "ref"))
      .as[String].collect().toList
    assert(got == List("https://ex.com/p?refresh=1"))
  }

  test("canonicalize is idempotent") {
    val raw = Seq(
      "HTTPS://Ex.COM:443//a//b?b=2&a=1#frag",
      "http://ex.com:80/x?utm_source=f&&z=9",
      "https://ex.com/p?ref=abc&refresh=1",
      "http://ex.com").toDF("url")
    val once = raw.select(UrlOps.canonicalize($"url").as("c"))
    val twice = once.select(UrlOps.canonicalize($"c"))
      .as[String].collect().toList
    assert(twice == once.as[String].collect().toList)
  }

  test("domainOf lowercases, strips port and leading www. only") {
    val got = Seq(
      "https://WWW.Example.COM:8080/p",
      "http://news.example.org/x",
      "https://wwwx.example.org/x"   // no www. prefix — untouched
    ).toDF("url").select(UrlOps.domainOf($"url")).as[String].collect().toList
    assert(got == List("example.com", "news.example.org", "wwwx.example.org"))
  }

  test("dedupByUrl groups spellings of one address; earliest id survives") {
    val df = Seq(
      (1L, "https://Ex.com/a?b=2&a=1"),
      (2L, "https://ex.com:443/a?a=1&b=2&utm_source=x"),
      (3L, "https://ex.com/a#frag"),
      (9L, "http://other.com/z")).toDF("doc_id", "url")
    val got = UrlOps.dedupByUrl(df, "url", "doc_id")
      .orderBy("canonical_url")
      .as[(String, Long, Long)].collect().toList
    assert(got == List(
      ("http://other.com/z", 9L, 1L),
      ("https://ex.com/a", 3L, 1L),
      ("https://ex.com/a?a=1&b=2", 1L, 2L)))
    // /a and /a?a=1&b=2 are DIFFERENT addresses: ids 1 and 2 merge
    // (param sort + tracking strip), id 3's bare /a stays its own group
  }

  test("domainCapFilter drops blocklisted domain and caps survivors") {
    val df = (1L to 40L).map { i =>
      val host = if (i % 2 == 0) "spam.net" else "ok.org"
      (i, 100 - i.toInt, s"https://$host/p/$i")
    }.toDF("doc_id", "n_chars", "url")
    val block = Seq("spam.net").toDF("blocked_domain")
    val got = UrlOps.domainCapFilter(df, "url", block, cap = 5,
      Seq($"n_chars".desc, $"doc_id".asc))
    val byDom = got.groupBy("domain").count().as[(String, Long)]
      .collect().toMap
    assert(byDom == Map("ok.org" -> 5L))
    // preference order: highest n_chars = lowest doc_id first
    val kept = got.orderBy("domain_rank").select("doc_id")
      .as[Long].collect().toList
    assert(kept == List(1L, 3L, 5L, 7L, 9L))
  }
}
