package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the check every LLM training pipeline
  * runs before a corpus ships: what fraction of each evaluation
  * document's n-grams already appear in the training data (the
  * GPT-3/PaLM-style n-gram overlap test).
  *
  * Shape at 100 TB: the benchmark side is tiny and the corpus side is
  * everything, so the corpus must STREAM and never be a hash build side.
  * The corpus's exploded shingles are semi-joined against the broadcast
  * benchmark shingle set (no corpus-wide DISTINCT, no corpus shuffle at
  * all — duplicates are harmless to a semi probe), and the surviving hit
  * set — at most the benchmark's size — joins back for the per-document
  * hit count. The first join broadcasts the benchmark side; the second
  * shuffles only benchmark-bounded rows. No row of the corpus ever
  * crosses the network.
  */
object Contamination {

  import ScaleHints.maybeBroadcast

  /** (benchId, n_shingles, n_hit, contamination∈[0,1]) per benchmark
    * document, where contamination = fraction of the doc's DISTINCT
    * k-token shingles found anywhere in the corpus. */
  def benchmarkOverlap(corpus: DataFrame, corpusText: String,
      bench: DataFrame, benchId: String, benchText: String,
      k: Int = 3): DataFrame = {
    val corpusShingles = corpus
      .select(explode(Dedup.tokenShingles(col(corpusText), k)).as("sh"))
    // MATERIALIZED when a re-scan is costly (ScaleHints.cutIfRescanCostly):
    // benchShingles feeds the distinct probe set, the per-doc totals AND
    // the hit counts — left lazy, the benchmark side is re-tokenized
    // three times.
    val benchShingles = ScaleHints.cutIfRescanCostly(
      bench.select(col(benchId),
        explode(Dedup.tokenShingles(col(benchText), k)).as("sh")),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val benchDistinct = benchShingles.select("sh").distinct()
    // corpus streams; hit set ⊆ benchmark shingles, so it stays tiny.
    // The second join is tiny ⋈ tiny: the hit set's PLAN still contains
    // the corpus scan, so its size ESTIMATE is corpus-sized and the
    // broadcast hint is (correctly) refused — but what actually shuffles
    // is only the benchmark-bounded hit rows, so the plain shuffled
    // equi-join is already the cheap plan. No corpus row crosses the
    // network at any point.
    val hitShingles = corpusShingles
      .join(maybeBroadcast(benchDistinct), Seq("sh"), "left_semi")
      .distinct()
    val total = benchShingles.groupBy(benchId)
      .agg(count(lit(1)).as("n_shingles"))
    val hit = benchShingles.join(hitShingles, Seq("sh"), "left_semi")
      .groupBy(benchId).agg(count(lit(1)).as("n_hit"))
    total.join(hit, Seq(benchId), "left_outer")
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
      .withColumn("contamination",
        col("n_hit") / col("n_shingles").cast("double"))
  }
}
