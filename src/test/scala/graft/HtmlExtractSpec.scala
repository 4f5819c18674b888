package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.HtmlExtract

/** F13 selector-cascade semantics (fda_watcher.py:158-227). */
class HtmlExtractSpec extends AnyFunSuite {

  private val filler = "This sentence provides sufficient substance for the gate."

  test("role=main wins the cascade") {
    val html =
      s"""<html><body>
         |<div class="sidebar"><p>nav junk that is long enough to matter</p></div>
         |<div role="main"><h1>Title</h1><p>$filler</p></div>
         |</body></html>""".stripMargin
    assert(HtmlExtract.extractText(html) == s"Title\n\n$filler")
  }

  test("field--name-body is the second choice") {
    val html =
      s"""<body><div class="x field--name-body y"><p>$filler</p><p>$filler</p></div></body>"""
    assert(HtmlExtract.extractText(html) == s"$filler\n\n$filler")
  }

  test("article, then node__content, then max-p div, then body") {
    val art = s"<body><article><p>$filler</p></article><div><p>a</p></div></body>"
    assert(HtmlExtract.extractText(art) == filler)
    val nc = s"<body><div class='node__content'><p>$filler</p></div></body>"
    assert(HtmlExtract.extractText(nc) == filler)
    val maxp =
      s"""<body><div><p>one</p></div>
         |<div><p>$filler</p><p>$filler</p></div></body>""".stripMargin
    assert(HtmlExtract.extractText(maxp) == s"$filler\n\n$filler")
    val body = s"<html><body><h2>H</h2><p>$filler</p></body></html>"
    assert(HtmlExtract.extractText(body) == s"H\n\n$filler")
  }

  test("list items: only direct children, in order") {
    val html =
      s"""<div role="main"><p>$filler</p>
         |<ul><li>item one</li><li>item two<ul><li>nested skipped</li></ul></li></ul>
         |</div>""".stripMargin
    val got = HtmlExtract.extractText(html)
    // BeautifulSoup parity: "item two"'s get_text includes its nested list
    // text, AND the nested <ul> is also found by the block walk — both
    // appear (fda_watcher.py:204,213-218 semantics)
    assert(got.split("\n\n").toList ==
      List(filler, "item one", "item two nested skipped", "nested skipped"))
  }

  test("inline tags flattened with spaces; entities decoded") {
    val html =
      s"""<div role="main"><p>Hello <b>bold</b> &amp; <i>ital</i> world — $filler</p></div>"""
    val got = HtmlExtract.extractText(html)
    assert(got.contains("Hello bold & ital world"))
  }

  test("substance gate: short content → empty") {
    assert(HtmlExtract.extractText("<body><p>tiny</p></body>") == "")
    assert(HtmlExtract.extractText("") == "")
    assert(HtmlExtract.extractText(null) == "")
  }

  test("url short-circuits (fda_watcher.py:130-134)") {
    assert(HtmlExtract.corpusForUrl(null, "x") == "")
    assert(HtmlExtract.corpusForUrl("ftp://nope", "x") == "")
    assert(HtmlExtract.corpusForUrl("https://x.org/doc.PDF", "x") ==
      "[PDF CONTENT - REQUIRES OCR]")
  }
}
