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

  test("minHashFromHashes == minHashSignature on the originating text " +
      "(the CandidateGen degrade banding contract)") {
    val coeffs = Sketches.minHashCoeffs(64)
    for (t <- Seq("x y z w v", "a b c", "one two three four five six",
        "  padded   tokens  here ", "")) {
      val viaText = Sketches.minHashSignature(t, 3, coeffs)
      val viaHashes = Sketches.minHashFromHashes(
        Sketches.hashedShingleSet(t, 3), coeffs)
      assert(viaText.sameElements(viaHashes), s"diverged on '$t'")
    }
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

  test("deflate_len matches a reference Deflater and orders repetition vs prose") {
    import org.apache.spark.unsafe.types.UTF8String
    def reference(s: String): Long = {
      val d = new java.util.zip.Deflater(6, true)
      d.setInput(s.getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](1 << 16)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      d.end(); n
    }
    val prose = "A rather different clause appears in every sentence here, " +
      "each mentioning distinct topics: harbors, violins, eclipses, basalt."
    val spam = "buy now click here " * 40
    for (s <- Seq(prose, spam, "", "x", "ab" * 5000)) {
      assert(graft.expr.SketchRuntime.deflateLen(UTF8String.fromString(s)) ==
        reference(s), s"mismatch for len=${s.length}")
    }
    // thread-local reuse does not leak state across calls
    val once = graft.expr.SketchRuntime.deflateLen(UTF8String.fromString(prose))
    graft.expr.SketchRuntime.deflateLen(UTF8String.fromString(spam))
    assert(graft.expr.SketchRuntime.deflateLen(UTF8String.fromString(prose)) == once)
    // the signal separates template spam from prose by a wide margin
    assert(reference(spam) * 1000 / spam.length <
      reference(prose) * 1000 / prose.length / 2)
  }

  test("compressionStats: schema, ratio bounds, repetitive doc ranks lowest") {
    val s = TestSpark.spark
    import s.implicits._
    val df = Seq(
      (1L, "the committee reviewed seventeen unrelated proposals about " +
        "geology, music, taxation, and harbor dredging during March"),
      (2L, "repeat this exact phrase " * 30),
      (3L, "")).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.compressionStats(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).schema.fieldNames.toSeq ==
      Seq("doc_id", "n_bytes", "deflate_bytes", "ratio_milli"))
    assert(out(3L).getLong(3) == 0) // empty text guarded, no div-by-zero
    assert(out(2L).getLong(3) < out(1L).getLong(3))
    assert(out(1L).getLong(3) > 0 && out(1L).getLong(3) < 1200)
  }
  test("winnowedRuns is the set form of rollingFingerprint: fold == scalar") {
    import graft.ops.Sketches
    val rnd = new scala.util.Random(42L)
    val texts = Seq("", "short", "x" * 16, "y" * 22,  // short + window-less edges
      "the quick brown fox jumps over the lazy dog again and again") ++
      (1 to 40).map(_ => Seq.fill(5 + rnd.nextInt(120))(
        ('a' + rnd.nextInt(4)).toChar).mkString)   // tiny alphabet -> hash ties
    texts.foreach { t =>
      val runs = Sketches.winnowedRuns(t)
      val folded =
        if (t.length < 16) {
          assert(runs.toSeq == Seq((0, 0, Sketches.fnv1a64(t))))
          Sketches.fnv1a64(t)
        } else {
          var acc = 0xcbf29ce484222325L
          runs.foreach { case (_, _, h) => acc ^= h; acc *= 0x100000001b3L }
          acc
        }
      if (t.length >= 16)
        assert(folded == Sketches.rollingFingerprint(t), s"len=${t.length}")
      // runs are strictly increasing in window start and dedup consecutive pos
      runs.sliding(2).foreach {
        case Array((w1, p1, _), (w2, p2, _)) =>
          assert(w1 < w2 && p1 != p2)
        case _ => ()
      }
    }
  }

  test("gram-hash fast path matches the substring-defined hashes") {
    import graft.ops.Sketches
    val rnd = new scala.util.Random(9L)
    val texts = (1 to 20).map(_ =>
      Seq.fill(20 + rnd.nextInt(60))((32 + rnd.nextInt(95)).toChar).mkString) :+
      "caf\u00e9 au lait plus enough trailing characters"   // non-ASCII fallback
    texts.foreach { t =>
      Sketches.gramHashes(t).foreach { case (p, h) =>
        if (p >= 0) assert(h == Sketches.fnv1a64(t.substring(p, p + 16)))
      }
    }
  }

}
