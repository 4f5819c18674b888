package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Retrieval, Dedup, TextAnalysis}

/** Hand-computed semantics for BM25 / RRF hybrid retrieval, the Gopher
  * rule gate, and C4-style token-block span dedup. */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs4 = Seq(
    (1L, "cat sat mat"),            // dl 3
    (2L, "cat cat dog"),            // dl 3, tf(cat)=2
    (3L, "dog runs far away now"),  // dl 5
    (4L, "bird bird bird bird"))    // dl 4
    .toDF("doc_id", "text")

  test("bm25TopK matches a hand-rolled BM25 computation") {
    val q = Seq((1L, "cat dog")).toDF("qid", "qtext")
    val got = Retrieval.bm25TopK(docs4, "doc_id", "text", q, "qid", "qtext", k = 3)
      .orderBy("rank").collect()

    // manual BM25, k1=1.2 b=0.75, N=4, sumdl=15
    def idfMicro(df: Long): Long =
      math.floor(1e6 * math.log(1.0 + (4L - df + 0.5) / (df + 0.5))).toLong
    def contrib(df: Long, tf: Long, dl: Long): Long = {
      val denom = tf.toDouble + 1.2 * ((1.0 - 0.75) +
        0.75 * dl.toDouble * 4.0 / 15.0)
      math.floor(idfMicro(df).toDouble * (tf.toDouble * (1.2 + 1.0)) / denom).toLong
    }
    // cat: df 2; dog: df 2
    val exp = Map(
      1L -> contrib(2, 1, 3),                      // cat only
      2L -> (contrib(2, 2, 3) + contrib(2, 1, 3)), // cat tf2 + dog tf1
      3L -> contrib(2, 1, 5))                      // dog only
    val expRank = exp.toSeq.sortBy { case (id, s) => (-s, id) }
    assert(got.map(r => (r.getLong(2), r.getLong(3))).toSeq == expRank)
    assert(got.map(_.getInt(1)).toSeq == Seq(1, 2, 3))
    // doc 4 shares no term — must not appear
    assert(!got.map(_.getLong(2)).contains(4L))
  }

  test("rrfFuse: fused score is the integer sum of reciprocal-rank parts") {
    val a = Seq((1L, 1, 10L), (1L, 2, 20L)).toDF("qid", "rank", "doc_id")
      .select($"qid", $"rank", $"doc_id")
    val b = Seq((1L, 1, 20L), (1L, 2, 30L)).toDF("qid", "rank", "doc_id")
      .select($"qid", $"rank", $"doc_id")
    val got = Retrieval.rrfFuse(Seq(a, b), k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    def part(r: Int) = math.floor(1.0e9 / (60.0 + r)).toLong
    // doc20: rank2 in a + rank1 in b; doc10: rank1 in a; doc30: rank2 in b
    val s20 = part(2) + part(1); val s10 = part(1); val s30 = part(2)
    assert(got.toSeq == Seq((1, 20L, s20), (2, 10L, s10), (3, 30L, s30)))
  }

  test("hybridRrfTopK equals the composed bm25+coverage rrfFuse exactly") {
    // deterministic pseudo-random corpus over a tiny vocab so both
    // rankings have dense, tie-heavy candidate sets
    def h(x: Long): Long = { var v = x * 2654435761L; v ^= v >>> 13; math.abs(v) }
    val words = Vector("cat", "dog", "bird", "mat", "sat", "runs", "far")
    val corpus = (1L to 60L).map { i =>
      val n = 3 + (h(i) % 8).toInt
      (i, (0 until n).map(j => words((h(i * 31 + j) % words.size).toInt))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val q = Seq((1L, "cat dog"), (2L, "bird mat runs"), (3L, "far cat"))
      .toDF("qid", "qtext")
    val idx = Retrieval.docTerms(corpus, "doc_id", "text").persist()
    try {
      val composed = Retrieval.rrfFuse(Seq(
        Retrieval.bm25TopKIndexed(idx, q, "qid", "qtext", k = 5),
        Retrieval.coverageTopKIndexed(idx, q, "qid", "qtext", k = 5)),
        k = 4).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSet
      val onePass = Retrieval.hybridRrfTopK(idx, q, "qid", "qtext",
          kPer = 5, k = 4).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(onePass == composed)
      assert(onePass.nonEmpty)
    } finally { idx.unpersist(); () }
  }

  test("coverage ranking orders by distinct query terms hit, then dl") {
    val q = Seq((1L, "cat dog")).toDF("qid", "qtext")
    val got = Retrieval.coverageTopK(docs4, "doc_id", "text", q, "qid", "qtext", k = 5)
      .orderBy("rank").collect().map(r => (r.getLong(2), r.getLong(3)))
    // doc2 hits both terms; docs 1,3 hit one each, doc1 shorter (dl 3 < 5)
    assert(got.toSeq == Seq((2L, 2L), (1L, 1L), (3L, 1L)))
  }

  test("gopherFlags: each rule trips independently, integer arithmetic only") {
    val rows = Seq(
      (1L, "the cat sat on the mat with a dog and more words here now"), // pass (minWords 5)
      (2L, "a b"),                              // too few words
      (3L, "the of to a is it on in and for"),  // mean word len < 3
      (4L, "1 2 3 4 5 the of")                  // alpha ratio 2/7 < 0.8
    ).toDF("doc_id", "text")
    val got = rows.select(
        col("doc_id") +: TextAnalysis.gopherFlags(col("text"), minWords = 5,
          maxWords = 100): _*)
      .orderBy("doc_id").collect()
    val pass = got.map(r => r.getAs[Boolean]("gopher_pass"))
    assert(pass.toSeq == Seq(true, false, false, false))
    assert(!got(1).getAs[Boolean]("ok_word_count"))
    assert(!got(2).getAs[Boolean]("ok_mean_word_len"))
    assert(!got(3).getAs[Boolean]("ok_alpha_ratio"))
    // doc 3 fails ONLY mean-word-len (stopwords present, count ok, alpha ok)
    assert(got(2).getAs[Boolean]("ok_word_count"))
    assert(got(2).getAs[Boolean]("ok_alpha_ratio"))
    assert(got(2).getAs[Boolean]("ok_stopwords"))
  }

  test("dedupTokenBlocks: first corpus occurrence survives, docs reassemble") {
    // block size 2: doc1 = [a b][c d]; doc2 = [a b][x y]; doc3 = [c d]
    val df = Seq(
      (1L, "a b c d"),
      (2L, "a b x y"),
      (3L, "c d"))
      .toDF("doc_id", "text")
    val got = Dedup.dedupTokenBlocks(df, "doc_id", "text", 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 2L, 2L, "a b c d"),  // first occurrence of both blocks
      (2L, 2L, 1L, "x y"),      // [a b] deleted, unique tail kept
      (3L, 1L, 0L, "")))        // fully duplicated ⇒ empty survivor
  }

  test("dedupTokenBlocks: trailing partial blocks dedup like full blocks") {
    val df = Seq((1L, "a b c"), (2L, "z z c")).toDF("doc_id", "text")
    // block 2: doc1 = [a b][c]; doc2 = [z z][c] — trailing [c] collides
    val got = Dedup.dedupTokenBlocks(df, "doc_id", "text", 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq((1L, 2L, "a b c"), (2L, 1L, "z z")))
  }

  test("stripBoilerplateBlocks: template blocks vanish EVERYWHERE, rare blocks stay") {
    // block size 2, maxDocs 2: [t p] appears in docs 1..4 (df 4 > 2 →
    // boilerplate, stripped from ALL including the first); [a b] df 2 stays
    val df = Seq(
      (1L, "t p a b"), (2L, "t p a b"), (3L, "t p c d"), (4L, "t p e f"),
      (5L, "g h"))
      .toDF("doc_id", "text")
    val got = Dedup.stripBoilerplateBlocks(df, "doc_id", "text", 2, maxDocs = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 2L, 1L, "a b"),   // boilerplate stripped from the FIRST doc too
      (2L, 2L, 1L, "a b"),   // df-2 block [a b] survives in both carriers
      (3L, 2L, 1L, "c d"),
      (4L, 2L, 1L, "e f"),
      (5L, 1L, 1L, "g h")))  // untouched doc passes through
  }

  test("mrrAtK: first relevant rank, hit counts, zero for missed queries") {
    val ranking = Seq(
      (1L, 1, 10L), (1L, 2, 20L), (1L, 3, 30L),
      (2L, 1, 40L), (2L, 2, 50L)).toDF("qid", "rank", "doc_id")
    val relevant = Seq((1L, 20L), (1L, 30L), (2L, 99L)).toDF("qid", "doc_id")
    // qid 3 retrieved NOTHING: it must still appear with a 0 row (the
    // universe comes from the query set, not from the ranking)
    val universe = Seq(Tuple1(1L), Tuple1(2L), Tuple1(3L)).toDF("qid")
    val got = Retrieval.mrrAtK(ranking, relevant, k = 3, universe)
      .orderBy("qid")
      .select("qid", "first_rank", "n_rel_in_topk", "rr_milli")
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 2, 2L, 500L),  // first relevant at rank 2 → 1000/2
      (2L, 0, 0L, 0L),    // relevant doc 99 not retrieved
      (3L, 0, 0L, 0L)))   // no ranking rows at all — still scored
  }

  test("ndcgAtK: hand-computed position-discounted gains, zero rows kept") {
    import graft.ops.Retrieval
    def g(r: Int): Long =
      math.floor(1e6 * math.log(2.0) / math.log(r + 1.0)).toLong
    val ranking = Seq((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L))
      .toDF("qid", "rank", "doc_id")
    // relevant: docs 11 (rank 2), 12 (rank 3), and 13 (not retrieved)
    val rel = Seq((1L, 11L), (1L, 12L), (1L, 13L)).toDF("qid", "doc_id")
    val queries = Seq((1L, "x"), (2L, "y")).toDF("qid", "qtext")
    val got = Retrieval.ndcgAtK(ranking, rel, k = 3, queries = queries)
      .collect().map(r => r.getAs[Long]("qid") ->
        ((r.getAs[Long]("dcg_micro"), r.getAs[Long]("idcg_micro"),
          r.getAs[Long]("ndcg_milli")))).toMap
    val dcg = g(2) + g(3)
    val idcg = g(1) + g(2) + g(3) // ideal prefix: min(R=3, k=3)
    assert(got(1L) == ((dcg, idcg, dcg * 1000 / idcg)))
    // qid 2 has no relevant docs: present, all zeros
    assert(got(2L) == ((0L, 0L, 0L)))
  }

  test("bm25 plan: no cartesian/nested-loop; query side broadcast") {
    val q = Seq((1L, "cat dog")).toDF("qid", "qtext")
    val plan = Retrieval.bm25TopK(docs4, "doc_id", "text", q, "qid", "qtext", k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // the corpus↔idf join must be hash-based with the tiny idf side built;
    // the only nested-loop allowed is the ONE-ROW corpus-stats cross join
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).length <= 1, plan)
    // per-query top-k prunes below the window (no full sort of all scores)
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("mergeIndex upsert equals a full rebuild over the merged corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val base = Retrieval.docTerms(docs, "doc_id", "text")
    val batch = docs.filter($"doc_id" % 7 === 0)
      .select($"doc_id", concat(lit("UPDATED "), $"text").as("text"))
      .unionByName(docs.filter($"doc_id" % 11 === 0)
        .select(($"doc_id" + 2000000).as("doc_id"),
          concat($"text", lit(" brand new words")).as("text")))
    val merged = Retrieval.mergeIndex(base, batch, "doc_id", "text")

    val mergedCorpus = docs.filter($"doc_id" % 7 =!= 0)
      .select("doc_id", "text").unionByName(batch)
    val rebuilt = Retrieval.docTerms(mergedCorpus, "doc_id", "text")

    val m = merged.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3))).toSet
    val rb = rebuilt.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3))).toSet
    assert(m == rb)
    assert(m.exists(_._1 >= 2000000), "new docs present")
    assert(m.exists { case (_, t, _, _) => t == "UPDATED" }, "updates replaced")
  }
}
