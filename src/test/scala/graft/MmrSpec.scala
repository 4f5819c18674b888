package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Retrieval

/** MMR diversification: hand-traced pick order + reference-greedy
  * equivalence over a seeded random fixture. */
class MmrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mmr prefers a diverse lower-rel doc over a near-dup higher-rel doc") {
    // A(1000) and B(990) are near-dups (sim 950); C(800) is fresh.
    // λ=0.7: after A, B scores 700*990-300*950=408000 < C's
    // 700*800-300*100=530000 → pick order A, C, B.
    val cand = Seq((1L, 10L, 1000L), (1L, 11L, 990L), (1L, 12L, 800L))
      .toDF("qid", "doc_id", "rel_milli")
    val simsHalf = Seq((1L, 10L, 11L, 950L), (1L, 10L, 12L, 100L),
      (1L, 11L, 12L, 100L))
    val sims = (simsHalf ++ simsHalf.map(p => (p._1, p._3, p._2, p._4)))
      .toDF("qid", "doc_a", "doc_b", "sim_milli")
    val got = Retrieval.mmrDiversify(cand, sims, k = 3, lambdaMilli = 700)
      .orderBy("rank").select("doc_id").as[Long].collect().toList
    assert(got == List(10L, 12L, 11L))
  }

  test("mmr trajectory equals reference greedy on a seeded fixture") {
    // deterministic pseudo-random rel/sims: 3 qids × 8 candidates
    def h(x: Long): Long = { var v = x * 2654435761L; v ^= v >>> 13; math.abs(v) }
    val cand = for (q <- 1L to 3L; d <- 1L to 8L)
      yield (q, d, h(q * 100 + d) % 1001)
    val sims0 = for {
      q <- 1L to 3L; a <- 1L to 8L; b <- 1L to 8L
      if a < b; s = h(q * 10000 + a * 100 + b) % 1001 if s > 0
    } yield (q, a, b, s)
    val sims = sims0 ++ sims0.map(p => (p._1, p._3, p._2, p._4))

    // driver-side reference greedy
    val lam = 700L
    val simMap = sims.map(p => ((p._1, p._2, p._3), p._4)).toMap
    val expect = (1L to 3L).flatMap { q =>
      val cs = cand.filter(_._1 == q).map(c => (c._2, c._3))
      var picked = List.empty[Long]
      (1 to 5).flatMap { rank =>
        val rem = cs.filterNot(c => picked.contains(c._1))
        if (rem.isEmpty) None
        else {
          val best = rem.minBy { case (d, rel) =>
            val pen = if (picked.isEmpty) 0L
              else picked.map(p => simMap.getOrElse((q, d, p), 0L)).max
            (-(lam * rel - (1000 - lam) * pen), d)
          }
          picked = picked :+ best._1
          Some((q, rank, best._1, best._2))
        }
      }
    }.toSet

    val got = Retrieval.mmrDiversify(
      cand.toDF("qid", "doc_id", "rel_milli"),
      sims.toDF("qid", "doc_a", "doc_b", "sim_milli"),
      k = 5, lambdaMilli = 700)
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(got == expect)
  }

  test("non-integral id columns fail fast with an actionable message") {
    val cand = Seq((1L, "docA", 500L)).toDF("qid", "doc_id", "rel_milli")
    val sims = Seq.empty[(Long, Long, Long, Long)]
      .toDF("qid", "doc_a", "doc_b", "sim_milli")
    val ex = intercept[IllegalArgumentException] {
      Retrieval.mmrDiversify(cand, sims, k = 2, lambdaMilli = 700)
    }
    assert(ex.getMessage.contains("integral id columns"))
  }

  test("qid with fewer candidates than k yields only its candidates") {
    val cand = Seq((1L, 10L, 500L), (1L, 11L, 400L))
      .toDF("qid", "doc_id", "rel_milli")
    val sims = Seq.empty[(Long, Long, Long, Long)]
      .toDF("qid", "doc_a", "doc_b", "sim_milli")
    val got = Retrieval.mmrDiversify(cand, sims, k = 5, lambdaMilli = 700)
      .orderBy("rank").as[(Long, Int, Long, Long)].collect().toList
    assert(got == List((1L, 1, 10L, 500L), (1L, 2, 11L, 400L)))
  }
}
