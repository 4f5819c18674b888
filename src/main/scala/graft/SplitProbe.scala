package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-timing main for `split_decontaminated` (r12 verdict #3: the
  * query doubled at sf1 on untouched code, 2.58 → 5.79 s, becoming the
  * inventory's max-ratio holder with no artifact decomposing the move).
  * Times, on a given SF dir, each stage the query rides: sketch
  * materialization, the band-bound aggregate, the prefix table +
  * prefix-bound aggregate (when that branch is taken), the verified
  * pair count, the declared end-to-end query, and the end-to-end time
  * with the pair scan deduplicated — the numbers the sf1 artifact
  * cites. Usage:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.SplitProbe <sfDir>"
  */
object SplitProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[split-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm page cache out of the timings

    // ── stage decomposition of Dedup.ngramJaccardPairs(threshold=0.5) ──
    val sketch = timed("sketch build + localCheckpoint")(
      docs.select(col("doc_id").as("id"), col("n_chars").cast("long").as("len"),
          graft.ops.Dedup.hashedShingles(col("text"), 3).as("hs"))
        .withColumn("n", size(col("hs")))
        .filter(col("n") > 0)
        .localCheckpoint(true))
    val bandBound = timed("band-bound aggregate")(
      graft.ops.CandidateGen.bandCandidateBound(sketch, 32))
    println(s"[split-probe] band bound = $bandBound (band-only gate 8e6)")
    if (bandBound > 8_000_000L) {
      val prefix = timed("prefix table + localCheckpoint")(
        graft.ops.CandidateGen.prefixTokens(sketch, 0.5,
          graft.ops.CandidateGen.gramDf(sketch)).localCheckpoint(true))
      val pBound = timed("prefix-bound aggregate (the r12 guard)")(
        graft.ops.CandidateGen.prefixCandidateBound(prefix, 32))
      println(s"[split-probe] prefix bound = $pBound (degrade gate 2e9)")
    }
    val pairs = timed("pairs end-to-end (candidates + verify), count")(
      { val p = graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          "n_chars", threshold = 0.5); p.count(); p })

    // ── the split stage, as declared (pairs plan scanned per use) ──
    timed("declared query end-to-end") {
      SparkEntry.queries("split_decontaminated")(spark, sfDir).count()
    }
    // ── the same with the verified pairs persisted (upper bound on
    // what any pair-scan dedup can save) ──
    timed("end-to-end with pairs persisted") {
      val p2 = graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        "n_chars", threshold = 0.5).persist()
      p2.count()
      val out = graft.ops.Sampling.decontaminateSplit(
        graft.ops.Sampling.assignSplit(docs, col("doc_id").cast("string"),
          testPerMyriad = 500, valPerMyriad = 500),
        col("doc_id"), p2, "i", "j")
      out.count()
      p2.unpersist()
    }
    spark.stop()
  }
}
