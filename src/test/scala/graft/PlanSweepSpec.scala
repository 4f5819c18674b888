package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-inventory plan-smell tripwire: every declared query's physical
  * plan at sf0.001, asserted free of CartesianProduct, with
  * BroadcastNestedLoopJoin allowed ONLY for the audited 1-row-aggregate
  * crossJoins (corpus stats / query bounds broadcast against the scan).
  * A new query that degenerates to all-pairs — or an edit that turns a
  * 1-row crossJoin into a real one — fails here before any bench sees
  * it. */
class PlanSweepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Queries whose plan legitimately carries a BroadcastNestedLoopJoin:
    * every one crossJoins a 1-row (or few-row, bounded-by-construction)
    * aggregate — corpus token totals, distinct counts, score bounds —
    * against a scan; the broadcast side is O(1) rows by construction. */
  private val oneRowCrossJoins = Set(
    "ann_bruteforce_topk", "ann_filtered_topk", "ann_pq_topk",
    "ann_quantized_topk", "ann_recall_eval", "curate_training_mix",
    "dedup_embedding_cosine", "mix_curriculum", "mix_temperature",
    "profile_approx", "profile_approx_incr", "profile_key_skew",
    "rag_bm25_topk", "rag_context_pack", "rag_eval_mrr", "rag_eval_ndcg",
    "rag_hard_negatives", "rag_hybrid_rrf", "rag_incremental_index",
    "sample_dsir", "text_bigram_pmi", "text_lm_score",
    "text_vocab_coverage",
    // r8 additions: corpus max-ts anchor / stratum totals — 1-row aggs;
    // random negatives crossJoins the bounded broadcast query batch
    // (the ann_bruteforce shape) before the 8% hash gate
    "events_decay_score", "mix_reweight", "rag_random_negatives",
    // r9: the MMR rewrite dropped its localCheckpoint cuts, so the
    // bm25 corpus-stats 1-row crossJoin (the rag_bm25_topk shape) is
    // now visible in its lineage instead of hidden behind a
    // materialized leaf — same audited broadcast, nothing new runs
    "rag_mmr_diversify")

  test("no query plans a CartesianProduct; BNLJ only on audited 1-row crossJoins") {
    val dir = "/root/testdata/sf0.001"
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan =
        try fn(spark, dir).queryExecution.executedPlan.toString
        catch { case e: Throwable =>
          offenders += s"$name: plan build failed (${e.getClass.getSimpleName})"; ""
        }
      if (plan.contains("CartesianProduct"))
        offenders += s"$name: CartesianProduct"
      if (plan.contains("BroadcastNestedLoopJoin") && !oneRowCrossJoins(name))
        offenders += s"$name: unaudited BroadcastNestedLoopJoin"
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
