package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming distribution-drift monitoring: the
  * [[graft.ops.Profile.histQuantileSketch]] accumulated across
  * micro-batches (foreachBatch), then scored with
  * [[graft.ops.Profile.psiFromSketches]] against a reference snapshot.
  *
  * This is the operational form of the sketch's mergeability claim: the
  * sketch is a plain (group, bin, count) table whose merge is addition,
  * so a stream that folds per-batch sketches into a running master MUST
  * end at the exact table the one-pass batch build produces — and the
  * driver's oracle hash-checks precisely that (t10 shares profile_psi's
  * oracle SQL).
  *
  * The per-batch `collect()` is bounded by construction: a sketch holds
  * at most groups × bins rows (hundreds), never rows-of-data — the same
  * bounded-driver-state argument as the BPE merge loop and the IVF
  * centroid table. At production scale the same fold writes to a
  * key-value store or a parquet master instead; the arithmetic is
  * identical.
  */
object DriftStream {

  /** File-source stream over the documents table (AvailableNow =
    * process everything currently there, batch-by-batch, then stop).
    * Schema comes from [[CurateStream.documentsSchema]] — the declared
    * constant every documents stream shares; no batch footer read. */
  def readDocs(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(CurateStream.documentsSchema)
      .option("pathGlobFilter", "documents.parquet")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Run an AvailableNow pass folding each micro-batch's histogram
    * sketch into a running master; returns the merged (group, bin, cnt)
    * sketch as a DataFrame. `groupCol` must be a STRING column (the
    * fold keys the driver map on it; a numeric stratum key needs a cast
    * at the call site). Specs inject multi-file directories to force
    * real multi-batch merging. */
  def runSketchNow(spark: SparkSession, stream: DataFrame,
      groupCol: String, metricCol: String, binWidth: Long): DataFrame = {
    val acc = scala.collection.mutable.Map.empty[(String, Long), Long]
    val q: StreamingQuery = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.ops.Profile
          .histQuantileSketch(batch, groupCol, metricCol, binWidth)
          .collect()
          .foreach { r =>
            val k = (r.getAs[String](groupCol), r.getAs[Long]("bin"))
            acc(k) = acc.getOrElse(k, 0L) + r.getAs[Long]("cnt")
          }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    import spark.implicits._
    acc.toSeq.map { case ((g, b), c) => (g, b, c) }
      .toDF(groupCol, "bin", "cnt")
  }
}
