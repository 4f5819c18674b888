package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the check every LLM training pipeline
  * runs before a corpus ships: what fraction of each evaluation
  * document's n-grams already appear in the training data (the
  * GPT-3/PaLM-style n-gram overlap test).
  *
  * Shape at 100 TB: the corpus side reduces to a DISTINCT shingle set
  * (one hash-shuffle, heavily combinable map-side), the benchmark side
  * is tiny and explodes to (doc, shingle) rows, and the hit test is a
  * LEFT SEMI join on the shingle — benchmark side broadcast, corpus
  * streamed, no row of the corpus ever leaves its executor twice.
  */
object Contamination {

  /** (benchId, n_shingles, n_hit, contamination∈[0,1]) per benchmark
    * document, where contamination = fraction of the doc's DISTINCT
    * k-token shingles found anywhere in the corpus. */
  def benchmarkOverlap(corpus: DataFrame, corpusText: String,
      bench: DataFrame, benchId: String, benchText: String,
      k: Int = 3): DataFrame = {
    val corpusShingles = corpus
      .select(explode(Dedup.tokenShingles(col(corpusText), k)).as("sh"))
      .distinct()
    val benchShingles = bench.select(col(benchId),
      explode(Dedup.tokenShingles(col(benchText), k)).as("sh"))
    val total = benchShingles.groupBy(benchId)
      .agg(count(lit(1)).as("n_shingles"))
    val hit = benchShingles.join(corpusShingles, Seq("sh"), "left_semi")
      .groupBy(benchId).agg(count(lit(1)).as("n_hit"))
    total.join(hit, Seq(benchId), "left_outer")
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
      .withColumn("contamination",
        col("n_hit") / col("n_shingles").cast("double"))
  }
}
