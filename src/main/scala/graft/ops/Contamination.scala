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
  * all — duplicates are harmless to a semi probe), the surviving hit
  * set is at most the benchmark's size, and it broadcasts back for the
  * per-document hit count. Both joins broadcast the small side; no row
  * of the corpus ever crosses the network.
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
    val benchShingles = bench.select(col(benchId),
      explode(Dedup.tokenShingles(col(benchText), k)).as("sh"))
    val benchDistinct = benchShingles.select("sh").distinct()
    // corpus streams; hit set ⊆ benchmark shingles, so it stays tiny.
    // Persist + materialize BEFORE the second join: the hit set's logical
    // plan contains the full corpus scan, so the optimizer's size estimate
    // is corpus-sized and maybeBroadcast would refuse the hint; the
    // materialized InMemoryRelation reports its true (benchmark-bounded)
    // size, which is what makes the broadcast-back actually plan.
    val hitShingles = corpusShingles
      .join(maybeBroadcast(benchDistinct), Seq("sh"), "left_semi")
      .distinct()
      .persist()
    hitShingles.count()
    val total = benchShingles.groupBy(benchId)
      .agg(count(lit(1)).as("n_shingles"))
    val hit = benchShingles.join(maybeBroadcast(hitShingles), Seq("sh"), "left_semi")
      .groupBy(benchId).agg(count(lit(1)).as("n_hit"))
    val out = total.join(hit, Seq(benchId), "left_outer")
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
      .withColumn("contamination",
        col("n_hit") / col("n_shingles").cast("double"))
    // result is per-benchmark-doc (tiny): materialize it eagerly, then
    // release the cached hit set so the operator leaves nothing pinned
    val result = out.localCheckpoint(true)
    hitShingles.unpersist()
    result
  }
}
