package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Chunker, TfIdfEmbed, Vectors}

/** RAG chunking + MLlib embedding generation + ANN composition. */
class ChunkEmbedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chunkByTokens: windows, overlap, trailing chunk, tiny doc") {
    val doc = (1 to 150).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, doc), (2L, "a b")).toDF("doc_id", "text")
    val got = Chunker.chunkByTokens(df, "text", size = 64, stride = 48)
      .select("doc_id", "chunk_idx", "chunk_text")
      .as[(Long, Int, String)].collect()
    val d1 = got.filter(_._1 == 1L).sortBy(_._2)
    // ceil(150/48) = 4 chunks
    assert(d1.map(_._2).toList == List(0, 1, 2, 3))
    assert(d1(0)._3.startsWith("w1 ") && d1(0)._3.split(" ").length == 64)
    // overlap: chunk1 starts at token 49
    assert(d1(1)._3.startsWith("w49 "))
    // trailing chunk is short: tokens 145..150
    assert(d1(3)._3.split(" ").length == 6)
    // tiny doc → single chunk, whole text
    assert(got.filter(_._1 == 2L).toList == List((2L, 0, "a b")))
  }

  test("chunkByParagraphs: boundaries kept, budget packing, oversized para intact") {
    val doc = Seq((1L, Seq(
      "one two three",          // 3 tokens → chunk 0 (off 0)
      "four five",              // 2 tokens → chunk 0 (off 3)
      "six seven eight nine",   // 4 tokens → chunk 0 (off 5 < 8)
      (10 to 18).map(i => s"t$i").mkString(" "), // 9 tokens → chunk 1 (off 9)
      (1 to 20).map(i => s"w$i").mkString(" ")   // oversized → own chunk (off 18)
    ).mkString("\n\n"))).toDF("doc_id", "text")
    val got = Chunker.chunkByParagraphs(doc, "text", maxTokens = 8)
      .select("chunk_idx", "chunk_text")
      .as[(Int, String)].collect().sortBy(_._1).toList
    assert(got.map(_._1) == List(0, 1, 2))
    assert(got(0)._2 == "one two three\n\nfour five\n\nsix seven eight nine")
    assert(got(1)._2 == (10 to 18).map(i => s"t$i").mkString(" "))
    assert(got(2)._2.startsWith("w1 ") && got(2)._2.endsWith(" w20"))
    // no paragraph is ever torn across chunks
    assert(got.forall(c => !c._2.split("\n\n").exists(_.isEmpty)))
  }

  test("chunk kernels == the HOF spellings they replaced") {
    // edge seams: space-only trim (tabs/newlines reach split, giving a
    // leading "" token), "" chunks as one empty chunk, null drops the
    // row, blank-line splits keep \n-singles inside paragraphs
    val edges = Seq("", " ", "one", "a b", "\ta b c", "a\nb\n\nc",
      " p1 one two \n\n\n\n p2 three ", "a\n\nb\n\nc\n\nd",
      (1 to 150).map(i => s"w$i").mkString(" ")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    for (df <- Seq(edges, docs)) {
      // token windows vs the former transform(sequence(...)) spelling
      val toks = split(trim(col("text")), "\\s+")
      val n = size(toks)
      val nChunks = ceil(n.cast("double") / 48).cast("int")
      val hofChunks = transform(sequence(lit(0), greatest(nChunks - 1, lit(0))),
        i => concat_ws(" ", slice(toks, (i * 48 + 1).cast("int"), lit(64))))
      val hofT = df.withColumn("__c",
          when(n > 0, hofChunks).otherwise(array().cast("array<string>")))
        .select(col("doc_id"), posexplode(col("__c")).as(Seq("ci", "ct")))
        .as[(Long, Int, String)].collect().toSet
      val kerT = Chunker.chunkByTokens(df, "text", size = 64, stride = 48)
        .select(col("doc_id"), col("chunk_idx"), col("chunk_text"))
        .as[(Long, Int, String)].collect().toSet
      assert(hofT == kerT)

      // paragraph assignment vs the former aggregate/zip_with cumsum
      val paras = filter(
        transform(split(col("text"), "\\n{2,}"), p => trim(p)),
        p => length(p) > 0)
      val counts = transform(paras, p => size(split(p, "\\s+")))
      val offsets = slice(
        aggregate(counts, array(lit(0)),
          (acc, x) => concat(acc, array(element_at(acc, -1) + x))),
        lit(1), size(counts))
      val hofAssigned = zip_with(paras, offsets, (p, off) =>
        struct(floor(off / 8).cast("int").as("chunk_idx"), p.as("para")))
      val hofP = df.select(col("doc_id"),
          posexplode(hofAssigned).as(Seq("pos", "a")))
        .select(col("doc_id"), col("pos"), col("a.chunk_idx"), col("a.para"))
        .as[(Long, Int, Int, String)].collect().toSet
      val kerP = df.select(col("doc_id"), posexplode(
          graft.expr.sketchFunctions.paragraph_chunks(col("text"), 8))
          .as(Seq("pos", "a")))
        .select(col("doc_id"), col("pos"), col("a.chunk_idx"), col("a.para"))
        .as[(Long, Int, Int, String)].collect().toSet
      assert(hofP == kerP)
    }
  }

  test("tf-idf embeddings: fixed dim, unit norm, identical docs coincide") {
    val df = Seq((1L, "spark engine fast"), (2L, "spark engine fast"),
      (3L, "completely different words here")).toDF("doc_id", "text")
    val emb = TfIdfEmbed.embed(df, "doc_id", "text", dim = 64)
      .as[(Long, Array[Float])].collect().toMap
    assert(emb.values.forall(_.length == 64))
    def norm(v: Array[Float]) = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(emb.values.forall(v => math.abs(norm(v) - 1.0) < 1e-6))
    assert(emb(1L).sameElements(emb(2L)))
    val cos13 = emb(1L).zip(emb(3L)).map { case (x, y) => x.toDouble * y }.sum
    assert(cos13 < 0.5)
  }

  test("embeddings compose with the ANN operator") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val emb = TfIdfEmbed.embed(docs, "doc_id", "text", dim = 128)
    val q = emb.filter($"doc_id" < 2)
    val top = Vectors.annBruteForceTopK(q, emb, "doc_id", "doc_id",
      "embedding", "embedding", k = 3).collect()
    assert(top.length == 2 * 3)
  }

  test("GraftExtensions registers SQL functions at session build") {
    val prev = org.apache.spark.sql.SparkSession.getDefaultSession
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    org.apache.spark.sql.SparkSession.clearActiveSession()
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("graft-ext")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    try {
      val r = s2.sql(
        "SELECT similarity('kitten','sitting') s, simhash64('a b c') h, " +
        "html_text('<html><body><article><p>" + ("w " * 30) +
        "</p></article></body></html>') t").collect()(0)
      assert(math.abs(r.getDouble(0) - 8.0 / 13) < 1e-12)
      assert(r.getLong(1) == graft.ops.Sketches.simHash64("a b c"))
      assert(r.getString(2) == ("w " * 30).trim)
    } finally {
      // do NOT stop s2 — it shares the JVM-wide SparkContext
      prev.foreach(org.apache.spark.sql.SparkSession.setDefaultSession)
      prev.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
    }
  }
}
