package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.QualityClassifier

/** Model-based quality filter: the linear classifier must recover a
  * separable weak-label rule from TF-IDF features and score
  * deterministically. */
class QualityClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // separable corpus: "good" docs are stopword-rich prose, "bad" docs are
  // symbol salad — disjoint vocabulary, so TF-IDF separates linearly
  private def corpus = {
    val good = (0 until 40).map(i =>
      (i.toLong, s"the quick fox $i jumps over the lazy dog and it is fine", 1))
    val bad = (0 until 40).map(i =>
      (100L + i, s"zzz$i qqq@@ ### $$$i %%% &&& *** !!!", 0))
    (good ++ bad).toDF("doc_id", "text", "weak_label")
  }

  test("recovers a separable weak label (train accuracy ≥ 0.95)") {
    val scored = QualityClassifier.trainScore(corpus, "doc_id", "text",
      "weak_label", dim = 64, fitSampleRows = 1000)
    val rows = scored.collect()
    assert(rows.length == 80)
    val correct = rows.count(r =>
      (r.getAs[Boolean]("pred") && r.getAs[Long]("label") == 1L) ||
      (!r.getAs[Boolean]("pred") && r.getAs[Long]("label") == 0L))
    assert(correct >= 76, s"only $correct/80 correct")
    // probabilities are valid milli-probs
    assert(rows.forall { r =>
      val p = r.getAs[Long]("prob_milli"); p >= 0L && p <= 1000L })
    spark.catalog.clearCache()
  }

  test("scoring is deterministic across fits (fixed sample order)") {
    val a = QualityClassifier.trainScore(corpus, "doc_id", "text",
      "weak_label", dim = 64, fitSampleRows = 1000)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2)))
    spark.catalog.clearCache()
    val b = QualityClassifier.trainScore(corpus, "doc_id", "text",
      "weak_label", dim = 64, fitSampleRows = 1000)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2)))
    spark.catalog.clearCache()
    assert(a.toSeq == b.toSeq)
  }
}
