package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Lexical retrieval over the document corpus — the sparse half of a RAG
  * retrieval stack (BASELINE.json north star: the reference ships corpus
  * JSONL for exactly this consumption; cf. rag_output_generator.py's
  * corpus records). BM25 gives the classic tf·idf ranking; [[rrfFuse]]
  * combines it with any other ranking (e.g. dense ANN from
  * [[Vectors.annBruteForceTopK]]) by reciprocal-rank fusion — the
  * standard hybrid-retrieval combiner.
  *
  * Engine-portable scoring: every per-term BM25 contribution is floored
  * to integer micro-units BEFORE the per-document sum, so scores are
  * integer sums of integers — invariant to partitioning, shuffle order,
  * and engine (the DuckDB oracle replays the identical arithmetic).
  * The only library function involved is ln(); +, ×, / on doubles are
  * exactly rounded by IEEE 754 and thus bit-equal across engines when
  * the expression tree matches.
  *
  * Scale shape (100 TB corpus, bounded query set): everything derives
  * from the [[docTerms]] inverted index — ONE corpus scan, one explode,
  * one map-side-combined aggregate. df, corpus stats, and the scoring
  * join are all branches over that index, so the convenience wrappers
  * persist it (the corpus is never read twice), and a production
  * deployment writes it out once (`docTerms(...).write...`) and feeds
  * [[bm25TopKIndexed]] per query batch — the same build-once/query-many
  * contract as [[Vectors.ivfSave]]. The query side and the per-term idf
  * table are broadcast (a query batch and its vocabulary are
  * driver-sized); per-document accumulation touches only the posting
  * lists of the query vocabulary; the final per-query top-k is
  * WindowGroupLimit-pruned — k·|queries| rows survive.
  */
object Retrieval {

  private def toks(c: Column): Column = split(trim(c), "\\s+")

  /** The inverted-index build: (doc_id, term, dl, tf) from one explode +
    * one aggregate. Materialize it once (`.persist()` in-session, or
    * `.write.parquet` across jobs) and every ranking below derives from
    * it — corpus stats included (n_docs = distinct doc_id, Σdl = Σtf). */
  def docTerms(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // split ONCE into an attribute before the explode: inlined, the
    // post-generate projection would recompute size(split(text)) per
    // EXPLODED row — O(tokens²) per document (measured 5.6× slower at
    // sf0.1); same pitfall as [[TextAnalysis.repetitionStats]]
    docs.select(col(idCol).as("doc_id"), toks(col(textCol)).as("__w"))
      .select(col("doc_id"), explode(col("__w")).as("term"),
        size(col("__w")).as("dl"))
      .groupBy("doc_id", "term", "dl").agg(count(lit(1)).as("tf"))
  }

  /** BM25 top-k per query over a prebuilt [[docTerms]] index. `queries`
    * is a small table (qidCol, qtextCol); query terms are deduplicated
    * (each distinct term scores once, the common spelling when queries
    * are keyword bags).
    *
    * Output: (qid, rank, doc_id, score_micro) — rank 1..k by
    * (score desc, doc_id asc); only docs sharing ≥1 term appear. */
  def bm25TopKIndexed(index: DataFrame, queries: DataFrame, qidCol: String,
      qtextCol: String, k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    topKByScore(bm25ScoresIndexed(index, queries, qidCol, qtextCol, k1, b),
      "score_micro", k)

  /** Convenience build-and-rank: builds [[docTerms]] and persists it for
    * the duration of the plan (df / stats / scoring all branch over it —
    * unpersisted, each branch would re-scan the corpus). Caller or
    * `spark.catalog.clearCache()` releases it, the same cache contract
    * as [[TfIdfEmbed.embed]]. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25TopKIndexed(docTerms(docs, idCol, textCol).persist(),
      queries, qidCol, qtextCol, k, k1, b)

  /** Incremental inverted-index maintenance — upsert a document batch
    * into a standing [[docTerms]] index: rows of re-ingested doc ids are
    * replaced, new ids appended, and ONLY the batch is tokenized (the
    * standing index never rescans its corpus). The anti-join's build
    * side is the bounded batch id set (broadcast), so the index side
    * keeps its partitioning. This completes the incremental trio with
    * [[graft.ops.Dedup.minHashDedupeAgainst]] and
    * [[graft.ops.Vectors.ivfIngest]].
    *
    * No secondary statistics table needs maintenance: corpus stats
    * (df, N, Σdl) are DERIVED from the index at query time
    * ([[bm25ScoresIndexed]]), which is exactly what makes the per-doc
    * decomposition mergeable — merge-then-derive equals
    * rebuild-then-derive by construction. */
  def mergeIndex(index: DataFrame, batch: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val fresh = docTerms(batch, idCol, textCol)
    index.join(ScaleHints.maybeBroadcast(fresh.select("doc_id").distinct()),
        Seq("doc_id"), "left_anti")
      .unionByName(fresh)
  }

  /** Full BM25 scores from a prebuilt index: (qid, doc_id, score_micro). */
  def bm25ScoresIndexed(index: DataFrame, queries: DataFrame, qidCol: String,
      qtextCol: String, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // corpus stats from the index: one tiny aggregate, broadcast by the
    // single-row cross join
    val corpus = index.agg(countDistinct(col("doc_id")).as("n_docs"),
      sum(col("tf")).as("sum_dl"))
    val dfTbl = index.groupBy("term").agg(count(lit(1)).as("df"))
    val qTerms = queries.select(col(qidCol).as("qid"),
      explode(array_distinct(toks(col(qtextCol)))).as("term"))
    // idf in micro-nats, floored once per term: ln is the lone libm call,
    // isolated here so the per-doc sum below is pure integer arithmetic
    val idf = qTerms.join(ScaleHints.maybeBroadcast(dfTbl), Seq("term"))
      .crossJoin(corpus)
      .withColumn("idf_micro", floor(lit(1e6) * log(
        lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
        .cast("long"))
    val contrib = index.join(
        ScaleHints.maybeBroadcast(
          idf.select("qid", "term", "idf_micro", "n_docs", "sum_dl")),
        Seq("term"))
      .withColumn("c_micro", floor(
        col("idf_micro").cast("double") *
          (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl").cast("double") *
              col("n_docs").cast("double") / col("sum_dl").cast("double"))))
        .cast("long"))
    contrib.groupBy("qid", "doc_id")
      .agg(sum(col("c_micro")).cast("long").as("score_micro"))
  }

  /** Convenience twin of [[bm25ScoresIndexed]] (persists the index it
    * builds; see [[bm25TopK]] for the cache contract). */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25ScoresIndexed(docTerms(docs, idCol, textCol).persist(),
      queries, qidCol, qtextCol, k1, b)

  /** Reciprocal-rank fusion of N rankings sharing (qid, doc_id, rank)
    * columns: score = Σ_i floor(1e9 / (k + rank_i)), missing docs
    * contribute 0. Pure integer output (the division is exactly rounded,
    * the floor lands on a stable integer), so the fused ranking is
    * engine- and order-independent. Re-ranked 1..k by
    * (fused score desc, doc_id asc).
    *
    * Inputs are per-query top-k tables (bounded), so the union + one
    * grouped sum is driver-trivial at any corpus scale — RRF cost is a
    * function of |queries|·k, never of the corpus.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    val contrib = rankings.map(_.select(col("qid"), col("doc_id"),
        floor(lit(1.0e9) / (lit(kRrf).cast("double") + col("rank").cast("double")))
          .cast("long").as("rrf_nano")))
      .reduce(_ unionAll _)
    val fused = contrib.groupBy("qid", "doc_id")
      .agg(sum(col("rrf_nano")).cast("long").as("rrf_nano"))
    val w = Window.partitionBy("qid").orderBy(col("rrf_nano").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "doc_id", "rrf_nano")
  }

  /** Term-coverage ranking over a prebuilt [[docTerms]] index — the
    * simple dense-free second ranking for hybrid tests: docs ranked per
    * query by (number of DISTINCT query terms present desc, dl asc,
    * doc_id asc). Same candidate semantics as BM25 (≥1 shared term).
    * Output (qid, rank, doc_id, n_hit). */
  def coverageTopKIndexed(index: DataFrame, queries: DataFrame,
      qidCol: String, qtextCol: String, k: Int): DataFrame = {
    val qTerms = queries.select(col(qidCol).as("qid"),
      explode(array_distinct(toks(col(qtextCol)))).as("term"))
    val hits = index.join(ScaleHints.maybeBroadcast(qTerms), Seq("term"))
      .groupBy("qid", "doc_id", "dl")
      .agg(count(lit(1)).as("n_hit"))
    val w = Window.partitionBy("qid")
      .orderBy(col("n_hit").desc, col("dl").asc, col("doc_id").asc)
    hits.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "doc_id", "n_hit")
  }

  /** Convenience twin of [[coverageTopKIndexed]] (no persist: a single
    * ranking reads the corpus once anyway). */
  def coverageTopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String, k: Int): DataFrame =
    coverageTopKIndexed(docTerms(docs, idCol, textCol), queries,
      qidCol, qtextCol, k)

  /** MRR@k — the lexical-retrieval quality scoreboard (twin of
    * [[Vectors.recallAtK]] for the dense side): per query, the reciprocal
    * of the FIRST relevant rank within the top-k, in floored milli-units
    * (1000/rank is one exactly-rounded division, so the metric is
    * engine-identical), plus the relevant-hit count. Queries with no
    * relevant doc in the top-k score 0 with first_rank 0.
    *
    * `ranking` carries (qid, rank, doc_id); `relevant` carries the
    * (qid, doc_id) ground truth; `queries` is the FULL query universe —
    * a query whose terms matched nothing has no ranking rows at all, and
    * deriving the universe from the ranking would silently drop it and
    * inflate the mean (it must contribute a 0 row). All three inputs are
    * bounded (top-k × queries / labeled pairs), so the evaluation is
    * driver-trivial at any corpus scale — this is the nightly tuning
    * loop for k1/b/analyzers. */
  def mrrAtK(ranking: DataFrame, relevant: DataFrame, k: Int,
      queries: DataFrame): DataFrame = {
    val hits = ranking.filter(col("rank") <= k)
      .join(relevant.select(col("qid"), col("doc_id")), Seq("qid", "doc_id"))
      .groupBy("qid")
      .agg(min(col("rank")).as("first_rank"), count(lit(1)).as("n_rel_in_topk"))
    queries.select("qid").distinct()
      .join(hits, Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("first_rank"), lit(0)).cast("int").as("first_rank"),
        coalesce(col("n_rel_in_topk"), lit(0L)).as("n_rel_in_topk"))
      .withColumn("rr_milli",
        when(col("first_rank") > 0,
          floor(lit(1000.0) / col("first_rank").cast("double")).cast("long"))
          .otherwise(lit(0L)))
  }

  /** NDCG@k (binary relevance) — the rank-position-sensitive twin of
    * [[mrrAtK]]: MRR only sees the FIRST relevant hit, NDCG credits the
    * whole ranked list with a logarithmic position discount. Every gain
    * term floors to micro-units BEFORE the per-query sum (integer sums
    * are merge-order-free; the natural log is the engine-portable
    * primitive this repo's entropy/LM scores already pin), so
    * dcg/idcg/ndcg are exact integers: gain(rank) =
    * ⌊1e6·ln2/ln(rank+1)⌋, idcg sums the ideal prefix min(R,k), ndcg =
    * dcg·1000 div idcg. Queries with no relevant docs anywhere score 0
    * (they must appear — deriving the universe from the ranking would
    * drop them). All inputs bounded by top-k×queries and labeled pairs:
    * driver-trivial at any corpus scale. */
  def ndcgAtK(ranking: DataFrame, relevant: DataFrame, k: Int,
      queries: DataFrame): DataFrame = {
    def gain(r: Column): Column =
      floor(lit(1000000.0) * log(lit(2.0)) / log(r.cast("double") + 1.0))
        .cast("long")
    val dcg = ranking.filter(col("rank") <= k)
      .join(relevant.select(col("qid"), col("doc_id")), Seq("qid", "doc_id"))
      .groupBy("qid").agg(sum(gain(col("rank"))).as("dcg_micro"))
    val relN = relevant.groupBy("qid").agg(count(lit(1)).as("__r"))
    val ideal = relN
      .select(col("qid"),
        explode(sequence(lit(1L), least(col("__r"), lit(k.toLong)))).as("i"))
      .groupBy("qid").agg(sum(gain(col("i"))).as("idcg_micro"))
    queries.select("qid").distinct()
      .join(dcg, Seq("qid"), "left")
      .join(ideal, Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("dcg_micro"), lit(0L)).as("dcg_micro"),
        coalesce(col("idcg_micro"), lit(0L)).as("idcg_micro"))
      .withColumn("ndcg_milli",
        when(col("idcg_micro") > 0,
          expr("dcg_micro * 1000L div idcg_micro")).otherwise(lit(0L)))
  }

  private def topKByScore(scored: DataFrame, scoreCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col(scoreCol).desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "doc_id", scoreCol)
  }

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
    * greedily pick `k` results per query maximizing
    * `λ·relevance − (1−λ)·max_similarity_to_already_picked` — the
    * standard diversification pass between retrieval and context
    * packing (near-duplicate passages burn context-window tokens that a
    * diverse set would spend on new evidence).
    *
    * All-integer arithmetic (`lambdaMilli` ∈ [0,1000], rel and sim in
    * milli-units), ties broken by doc_id — so the greedy trajectory is
    * engine-exact and the oracle replays it as a recursive CTE.
    *
    * Spark-first shape: the greedy loop is UNROLLED into k declarative
    * rounds (each: anti-join away the picked set, one sparse
    * sims-to-picked join + max, one WindowGroupLimit argmax per qid) —
    * no UDF, no collect, no per-group state; `candidates`/`sims` are
    * small per qid (≤ nCand and ≤ nCand² rows) and every round keys its
    * joins and window on qid, so the pass scales linearly with the
    * number of queries. Callers should materialize both inputs
    * (`localCheckpoint`) — the unrolled plan branches over them k
    * times and nests k windows deep, so un-truncated lineage makes the
    * PLANNER the bottleneck, not the data ([[mmrTopK]] does; measured:
    * sf0.01 planning blew the driver heap without it). The per-round
    * frontier is checkpointed for the same reason — plan size stays
    * O(k), not O(k²).
    *
    * `candidates`: (qid, doc_id, rel_milli); `sims`: (qid, doc_a,
    * doc_b, sim_milli), symmetric, zero-sim pairs omitted. Output:
    * (qid, rank, doc_id, rel_milli), rank 1..k in pick order.
    */
  def mmrDiversify(candidates: DataFrame, sims: DataFrame, k: Int,
      lambdaMilli: Int): DataFrame = {
    require(k >= 1 && lambdaMilli >= 0 && lambdaMilli <= 1000)
    val w = Window.partitionBy("qid").orderBy(col("__score").desc, col("doc_id").asc)
    def pickOne(scored: DataFrame, rank: Int): DataFrame =
      scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .select(col("qid"), lit(rank).cast("int").as("rank"), col("doc_id"),
          col("rel_milli"))
    // first pick: λ·rel with no picked set yet — argmax(rel)
    var selected = pickOne(
      candidates.withColumn("__score", col("rel_milli") * lambdaMilli), 1)
    for (i <- 2 to k) {
      val selIds = selected.select("qid", "doc_id")
      val remaining = candidates.join(selIds, Seq("qid", "doc_id"), "left_anti")
      val pen = sims.join(selIds.withColumnRenamed("doc_id", "doc_b"),
          Seq("qid", "doc_b"))
        .groupBy(col("qid"), col("doc_a").as("doc_id"))
        .agg(max("sim_milli").as("__pen"))
      val scored = remaining.join(pen, Seq("qid", "doc_id"), "left")
        .withColumn("__score",
          col("rel_milli") * lambdaMilli -
            coalesce(col("__pen"), lit(0L)) * (1000 - lambdaMilli))
      selected = selected.unionByName(pickOne(scored, i))
      // lineage cut every SECOND round (the PageRank cadence): with
      // candidates/sims already materialized leaves, one un-cut round
      // nests only a single window/join layer — half the eager jobs
      if (i % 2 == 0 && i < k) selected = selected.localCheckpoint(true)
    }
    selected
  }

  /** BM25 retrieve-then-MMR-diversify over one shared [[docTerms]]
    * index: top-`nCand` BM25 candidates per query (relevance rescaled
    * to rel_milli = ⌊1000·score/max_score⌋ per qid), candidate-pair
    * similarity = distinct-token Jaccard in milli-units (computed only
    * among each query's candidates — the corpus never self-joins), then
    * [[mmrDiversify]] down to `k`. */
  def mmrTopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      nCand: Int, k: Int, lambdaMilli: Int): DataFrame = {
    val index = docTerms(docs, idCol, textCol).persist()
    val top = bm25TopKIndexed(index, queries, qidCol, qtextCol, nCand)
    val mx = top.groupBy("qid").agg(max("score_micro").as("__mx"))
    val candidates = top.join(mx, "qid")
      .select(col("qid"), col("doc_id"),
        expr("score_micro * 1000L div __mx").as("rel_milli"))
      .localCheckpoint(true)
    val candTerms = candidates.select("qid", "doc_id")
      .join(index.select("doc_id", "term"), "doc_id")
      .select(col("qid"), col("doc_id"), col("term"))
      .localCheckpoint(true)
    val sz = candTerms.groupBy("qid", "doc_id").agg(count(lit(1)).as("n"))
    val inter = candTerms.alias("x").join(candTerms.alias("y"),
        col("x.qid") === col("y.qid") && col("x.term") === col("y.term") &&
          col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.qid").as("qid"), col("x.doc_id").as("doc_a"),
        col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("ov"))
    val jac0 = inter
      .join(sz.toDF("qid", "doc_a", "na"), Seq("qid", "doc_a"))
      .join(sz.toDF("qid", "doc_b", "nb"), Seq("qid", "doc_b"))
      .select(col("qid"), col("doc_a"), col("doc_b"),
        expr("1000L * ov div (na + nb - ov)").as("sim_milli"))
    val sims = jac0.unionByName(jac0.select(col("qid"),
      col("doc_b").as("doc_a"), col("doc_a").as("doc_b"),
      col("sim_milli"))).localCheckpoint(true)
    mmrDiversify(candidates, sims, k, lambdaMilli)
  }
}
