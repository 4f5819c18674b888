package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Bpe

/** BPE tokenizer training: hand-derived merges on the classic
  * low/lower corpus, deterministic refit, and the lossless round-trip
  * property of the corpus-wide encode. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Sennrich et al.'s running example shape: {low ×5, lower ×2}
  private def corpus = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower"))
    .toDF("doc_id", "text")

  test("fit learns the hand-derivable merge sequence") {
    val m = Bpe.fit(corpus, "text", nMerges = 4)
    // pair counts round 1: (l,o)=7, (o,w)=7, (w,</w>)=5, (w,e)=2, (e,r)=2,
    // (r,</w>)=2 → tie (l,o)/(o,w) breaks lexicographically → (l,o)
    // round 2: (lo,w)=7 wins; round 3: (low,</w>)=5; round 4: ties at 2:
    // (e,r) vs (low,e) vs (r,</w>) → (e,r)
    assert(m.merges == List(
      ("l", "o"), ("lo", "w"), ("low", "</w>"), ("e", "r")))
  }

  test("refit is identical; encode applies ranks greedily") {
    val m1 = Bpe.fit(corpus, "text", nMerges = 4)
    val m2 = Bpe.fit(corpus, "text", nMerges = 4)
    assert(m1 == m2)
    assert(Bpe.encodeText("low", m1.ranks).toSeq == Seq("low</w>"))
    assert(Bpe.encodeText("lower", m1.ranks).toSeq ==
      Seq("low", "er", "</w>"))
    // unseen word: merges apply where they can ("low" then "low</w>"
    // both fire), untouched chars remain
    assert(Bpe.encodeText("slow", m1.ranks).toSeq == Seq("s", "low</w>"))
  }

  test("merge exhaustion stops early instead of looping") {
    val m = Bpe.fit(Seq((1L, "ab")).toDF("doc_id", "text"), "text",
      nMerges = 100)
    // "ab</w>" fully merges in 2 steps; no more pairs after that
    assert(m.merges.length <= 3)
  }

  test("distributed pair-count fit emits the identical merge table") {
    // the hand-derivable corpus (incl. its lexicographic tie) AND a real
    // text slice: both paths must agree merge-for-merge
    assert(Bpe.fitDistributed(corpus, "text", nMerges = 4).merges ==
      Bpe.fit(corpus, "text", nMerges = 4).merges)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(120)
    val a = Bpe.fit(docs, "text", nMerges = 12)
    val b = Bpe.fitDistributed(docs, "text", nMerges = 12)
    assert(a.merges == b.merges)
    assert(a.merges.length == 12)
  }

  test("save/load round-trips the merge list exactly") {
    val m = Bpe.fit(corpus, "text", nMerges = 4)
    val p = java.nio.file.Files.createTempFile("graft_bpe", ".txt")
    try {
      Bpe.save(m, p)
      assert(Bpe.load(p) == m)
    } finally java.nio.file.Files.deleteIfExists(p)
  }

  test("corpus-wide encode round-trips: pieces rejoin to the original words") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(100)
    val model = Bpe.fit(docs, "text", nMerges = 32)
    val joined = docs.select($"doc_id", $"text",
        concat_ws("", Bpe.encode($"text", model)).as("glued"))
      .withColumn("expect",
        concat(regexp_replace(trim($"text"), "\\s+", Bpe.EndOfWord),
          lit(Bpe.EndOfWord)))
      .filter($"glued" =!= $"expect")
    assert(joined.count() == 0)
    // and the encode is non-trivial: merged pieces shorten the stream
    val n = docs.select(sum(size(Bpe.encode($"text", model)))).collect()(0).getLong(0)
    val chars = docs.select(sum(length(regexp_replace(trim($"text"), "\\s+", ""))))
      .collect()(0).getLong(0)
    assert(n < chars, s"pieces $n not below char count $chars — no merge applied")
  }
  test("fit argmax ties break in code-point order, matching fitDistributed") {
    // supplementary-plane char (U+1D11E) vs private-use BMP char
    // (U+E000): Java UTF-16 ordering sorts the surrogate pair FIRST,
    // UTF-8/code-point ordering (Spark SQL string ORDER BY) sorts it
    // LAST - an exact-count tie between the two must resolve the same
    // way in the driver loop and the distributed fit
    val supp = new String(Character.toChars(0x1D11E))
    val pua = "\uE000"
    val df = Seq((1L, s"a$supp a$pua")).toDF("doc_id", "text")
    val m = Bpe.fit(df, "text", nMerges = 1)
    assert(m.merges.head == ("a", pua),
      s"fit broke the tie as ${m.merges.head} - UTF-16 collation leak")
    val md = Bpe.fitDistributed(df, "text", nMerges = 1)
    assert(md.merges.head == m.merges.head)
  }


  test("full-text encode == concatenation of per-word encodes (the oracle's artifact split)") {
    // the text_bpe_pieces oracle joins exported PER-WORD pieces to the
    // tokenized corpus; that replay is sound only because encodeText
    // treats words independently — pin it, including over supplementary-
    // plane words, repeated words and degenerate whitespace
    import graft.ops.Bpe
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").limit(50).collect().map(_.getString(0))
    val extra = Seq("", "   ", "a", "a a a", "low lower lowest low",
      "\uD83D\uDE00 emoji \uD83D\uDE00", "tab\tand  doubled   spaces")
    val model = Bpe.fit(docs.foldLeft(spark.createDataFrame(
      Seq.empty[Tuple1[String]]).toDF("text")) { (df, t) =>
        df.union(Seq(Tuple1(t)).toDF("text")) }, "text", nMerges = 16)
    (docs ++ extra).foreach { t =>
      val full = Bpe.encodeText(t, model.ranks).toSeq
      val perWord = t.trim.split("\\s+").filter(_.nonEmpty).toSeq
        .flatMap(w => Bpe.encodeText(w, model.ranks))
      assert(full == perWord, s"divergence on: '$t'")
    }
  }
}
