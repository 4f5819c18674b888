package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.CleanCorpus

/** Goldens generated from the reference implementation by
  * tools/gen_goldens.py (fda_rag_extraction/scripts/json_split_and_clean.py
  * run under CPython) — every rule family of FIXTURES.md B2 plus quirk
  * probes. */
class CleanCorpusSpec extends AnyFunSuite {

  private val goldens = Goldens.load("clean_corpus")

  goldens.zipWithIndex.foreach { case (g, i) =>
    test(s"clean_corpus golden #$i") {
      val in = Goldens.str(g("input"))
      val expected = Goldens.str(g("expected"))
      assert(CleanCorpus.clean(in) == expected,
        s"\ninput:\n$in\nexpected:\n$expected\ngot:\n${CleanCorpus.clean(in)}")
    }
  }

  test("clean_corpus is idempotent on all goldens") {
    goldens.foreach { g =>
      val once = Goldens.str(g("expected"))
      assert(CleanCorpus.clean(once) == once, s"not idempotent on: $once")
    }
  }

  test("null and empty input") {
    assert(CleanCorpus.clean(null) == "")
    assert(CleanCorpus.clean("") == "")
  }
}
