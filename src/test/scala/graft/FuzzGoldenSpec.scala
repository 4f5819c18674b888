package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{CleanCorpus, Similarity}

/** Fuzz parity vs CPython (tools/gen_fuzz_goldens.py): 250 random
  * rule-mix documents through the reference clean_corpus, 360 random
  * string pairs (incl. the autojunk regime and near-identical long pairs)
  * through difflib. Byte-exact / 1e-12 agreement required. */
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

  test("similarity matches difflib on 360 fuzz pairs") {
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
    assert(checked == 360)
  }
}
