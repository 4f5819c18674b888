package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Similarity

/** difflib `SequenceMatcher.ratio()` parity — fixtures precomputed by
  * CPython (tools/gen_goldens.py), spanning empty strings, transposed
  * blocks, the 0.90-threshold region, and the autojunk regime (|b| >= 200).
  * Exactness matters: the reference's verify decision is `ratio >= 0.90`
  * (pdf_extraction/pubmed_enrichment.py:291-293). */
class SimilaritySpec extends AnyFunSuite {

  Goldens.load("similarity").zipWithIndex.foreach { case (g, i) =>
    test(s"ratio golden #$i") {
      val a = Goldens.str(g("a"))
      val b = Goldens.str(g("b"))
      val expected = Goldens.dbl(g("ratio"))
      val got = Similarity.ratio(a, b)
      assert(math.abs(got - expected) < 1e-12,
        s"ratio('$a','$b') expected $expected got $got")
    }
  }

  test("symmetry is NOT guaranteed by difflib (b-side junk) — but identical strings are 1.0") {
    assert(Similarity.ratio("same", "same") == 1.0)
  }

  test("nulls are dissimilar") {
    assert(Similarity.ratio(null, "x") == 0.0)
    assert(Similarity.ratio("x", null) == 0.0)
  }
}
