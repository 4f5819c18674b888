package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.ops.{CleanCorpus, Similarity, Sketches}

/** Property tests (SURVEY §5 plan item 3) — seeded generators, no
  * external property framework (offline dependency set). */
class PropertySpec extends AnyFunSuite {

  private def genText(rnd: Random): String = {
    val lines = Seq(
      () => rnd.alphanumeric.take(rnd.nextInt(40)).mkString,
      () => "The application was granted priority review today.",
      () => "Recommended Dosage",
      () => "Take 120 mg orally once daily.",
      () => "Dosing schedule:",
      () => "",
      () => "   spaced   words   here   ")
    (0 until 12).map(_ => lines(rnd.nextInt(lines.length))()).mkString("\n")
  }

  test("clean_corpus is idempotent on 300 random rule-mix documents") {
    val rnd = new Random(7)
    (1 to 300).foreach { _ =>
      val t = genText(rnd)
      val once = CleanCorpus.clean(t)
      assert(CleanCorpus.clean(once) == once, s"not idempotent on:\n$t")
    }
  }

  test("similarity is bounded in [0,1]; identity is 1; disjoint is 0") {
    val rnd = new Random(11)
    (1 to 500).foreach { _ =>
      val a = rnd.alphanumeric.take(rnd.nextInt(30)).mkString
      val b = rnd.alphanumeric.take(rnd.nextInt(30)).mkString
      val r = Similarity.ratio(a, b)
      assert(r >= 0.0 && r <= 1.0)
      if (a.nonEmpty) assert(Similarity.ratio(a, a) == 1.0)
    }
    assert(Similarity.ratio("abc", "xyz") == 0.0)
  }

  test("similarity matches an independent difflib reimplementation on 500 random pairs") {
    // from-scratch reference using difflib's selection rule: runs are
    // discovered by END position (i asc, j asc), first maximal wins;
    // strings < 200 chars so autojunk never applies
    def naive(a: String, b: String): Double = {
      def lm(al: Int, ah: Int, bl: Int, bh: Int): (Int, Int, Int) = {
        var bi = al; var bj = bl; var bk = 0
        var i = al
        while (i < ah) {
          var j = bl
          while (j < bh) {
            if (a(i) == b(j)) {
              var k = 1
              while (i - k >= al && j - k >= bl && a(i - k) == b(j - k)) k += 1
              if (k > bk) { bi = i - k + 1; bj = j - k + 1; bk = k }
            }
            j += 1
          }
          i += 1
        }
        (bi, bj, bk)
      }
      def blocks(al: Int, ah: Int, bl: Int, bh: Int): Int = {
        val (i, j, k) = lm(al, ah, bl, bh)
        if (k == 0) 0
        else k + blocks(al, i, bl, j) + blocks(i + k, ah, j + k, bh)
      }
      if (a.isEmpty && b.isEmpty) 1.0
      else 2.0 * blocks(0, a.length, 0, b.length) / (a.length + b.length)
    }
    val rnd = new Random(13)
    (1 to 500).foreach { _ =>
      val a = (0 until rnd.nextInt(14)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      val b = (0 until rnd.nextInt(14)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      assert(math.abs(Similarity.ratio(a, b) - naive(a, b)) < 1e-12,
        s"a=$a b=$b got=${Similarity.ratio(a, b)} want=${naive(a, b)}")
    }
  }

  test("JVM and columnar shingle constructions agree") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new Random(17)
    val texts = (1 to 40).map { _ =>
      (0 until rnd.nextInt(10)).map(_ => Seq("ab", "cd", "ef", "gh")(rnd.nextInt(4)))
        .mkString(" ")
    }
    val columnar = texts.toDF("text")
      .select(graft.ops.Dedup.tokenShingles($"text", 3))
      .collect().map(_.getSeq[String](0).toList)
    texts.zip(columnar).foreach { case (t, c) =>
      assert(Sketches.tokenShingles(t, 3).toList == c, s"text='$t'")
    }
  }

  test("hashedShingleSet is the sorted fnv image of the shingle set") {
    val rnd = new Random(19)
    (1 to 200).foreach { _ =>
      val t = (0 until 8).map(_ => rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString)
        .mkString(" ")
      val hs = Sketches.hashedShingleSet(t, 3)
      val expect = Sketches.tokenShingles(t, 3).map(Sketches.fnv1a64).sorted
      assert(hs.sameElements(expect))
    }
  }

  test("md5 fingerprint dedup is idempotent (D1 re-ingest property)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new Random(23)
    val rows = (1 to 50).map(i => (s"url${rnd.nextInt(20)}", i.toLong))
    val df = rows.toDF("url", "v")
      .select(org.apache.spark.sql.functions.md5($"url").as("rag_id"), $"v")
    val d1 = graft.ops.Fingerprint.dedupByFingerprint(df, "rag_id", "v")
    val d2 = graft.ops.Fingerprint.dedupByFingerprint(
      d1.unionByName(d1), "rag_id", "v")
    assert(d1.collect().toSet == d2.collect().toSet)
  }
}
