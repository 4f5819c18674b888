package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Sketches

class SketchesSpec extends AnyFunSuite {

  test("fnv1a64 is deterministic and spreads") {
    assert(Sketches.fnv1a64("abc") == Sketches.fnv1a64("abc"))
    assert(Sketches.fnv1a64("abc") != Sketches.fnv1a64("abd"))
    assert(Sketches.fnv1a64("") == 0xcbf29ce484222325L)
  }

  test("tokenShingles produces ordered distinct k-grams") {
    assert(Sketches.tokenShingles("a b c d", 3).toList == List("a b c", "b c d"))
    assert(Sketches.tokenShingles("a b", 3).isEmpty)
    assert(Sketches.tokenShingles("a b a b a b", 2).toList == List("a b", "b a"))
  }

  test("minhash signature: length, range, identity") {
    val coeffs = Sketches.minHashCoeffs(64)
    val sig = Sketches.minHashSignature("x y z w v", 3, coeffs)
    assert(sig.length == 64)
    assert(sig.forall(v => v >= 0 && v <= Sketches.MinHashP))
    assert(sig.sameElements(Sketches.minHashSignature("x y z w v", 3, coeffs)))
    // empty text → sentinel signature
    assert(Sketches.minHashSignature("", 3, coeffs).forall(_ == Sketches.MinHashP))
  }

  test("simhash: identical → equal; near-dup → low hamming; disjoint → high") {
    val a = (1 to 80).map(i => s"t$i").mkString(" ")
    val b = a.replace("t40", "q40")
    val c = (200 to 280).map(i => s"u$i").mkString(" ")
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(Sketches.simHash64(a), Sketches.simHash64(a)) == 0)
    assert(ham(Sketches.simHash64(a), Sketches.simHash64(b)) <= 10)
    assert(ham(Sketches.simHash64(a), Sketches.simHash64(c)) >= 20)
  }

  test("rolling fingerprint: equality, mid-edit sensitivity, short-input fallback") {
    val t = "the quick brown fox jumps over the lazy dog " * 5
    assert(Sketches.rollingFingerprint(t) == Sketches.rollingFingerprint(t))
    // a mid-document edit perturbs many windows → fingerprint changes
    // (tail-appends may legitimately leave the selected minima unchanged —
    // winnowing is intentionally robust to small local edits)
    val edited = t.replaceFirst("jumps", "leaps")
    assert(Sketches.rollingFingerprint(t) != Sketches.rollingFingerprint(edited))
    assert(Sketches.rollingFingerprint("short") == Sketches.fnv1a64("short"))
  }
}
