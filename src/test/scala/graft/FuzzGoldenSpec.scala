package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{CleanCorpus, Similarity}

/** Fuzz parity vs CPython (tools/gen_fuzz_goldens.py): 250 random
  * rule-mix documents through the reference clean_corpus, 420 random
  * string pairs through difflib — incl. the autojunk regime in BOTH the
  * homogeneous-alphabet shape and the mixed popular/rare shape where
  * match extensions must pass through chars dropped from b2j (CPython's
  * bjunk is empty under isjunk=None), plus near-identical long pairs.
  * Byte-exact / 1e-12 agreement required. */
class FuzzGoldenSpec extends AnyFunSuite {

  test("clean_corpus matches the reference on 250 fuzz documents") {
    val goldens = Goldens.load("clean_corpus_fuzz")
    var checked = 0
    goldens.foreach { g =>
      val in = Goldens.str(g("input"))
      val expected = Goldens.str(g("expected"))
      val got = CleanCorpus.clean(in)
      assert(got == expected,
        s"\n--- input ---\n$in\n--- expected ---\n$expected\n--- got ---\n$got")
      checked += 1
    }
    assert(checked == 250)
  }

  test("similarity matches difflib on 420 fuzz pairs") {
    val goldens = Goldens.load("similarity_fuzz")
    var checked = 0
    goldens.foreach { g =>
      val a = Goldens.str(g("a"))
      val b = Goldens.str(g("b"))
      val expected = Goldens.dbl(g("ratio"))
      val got = Similarity.ratio(a, b)
      assert(math.abs(got - expected) < 1e-12,
        s"a='$a' b='$b' expected=$expected got=$got")
      checked += 1
    }
    assert(checked == 420)
  }
}
