package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.DoiExtract

/** Goldens from the reference extract_doi
  * (pdf_extraction/pdf_marker_extraction.py:134-163) run under CPython:
  * window truncation at 5000 chars, trailing-punct strip, length/slash
  * validity, bibliography-context veto (including the str.find first-
  * occurrence quirk). */
class DoiExtractSpec extends AnyFunSuite {

  Goldens.load("extract_doi").zipWithIndex.foreach { case (g, i) =>
    test(s"extract_doi golden #$i") {
      val text = Goldens.str(g("text"))
      val expected = Option(Goldens.str(g("doi")))
      assert(DoiExtract.extractDoi(text) == expected)
    }
  }

  test("null/empty input") {
    assert(DoiExtract.extractDoi(null).isEmpty)
    assert(DoiExtract.extractDoi("").isEmpty)
  }
}
