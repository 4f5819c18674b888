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
  * The fold itself stays DISTRIBUTED — per batch, the running master is
  * unionByName + re-sum with the batch's sketch (the exact
  * profile_psi_incr shape), materialized by localCheckpoint so the plan
  * does not deepen across batches; no sketch row ever lands in driver
  * memory. The state is still bounded by groups × bins ONLY if the
  * caller's group column is bounded, so `maxStateRows` enforces that
  * contract explicitly: a high-cardinality group column fails the
  * stream fast with an actionable message instead of silently growing
  * executor state. At production scale the same fold writes to a
  * parquet master instead; the arithmetic is identical.
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
    * sketch as a DataFrame. The fold is union + re-sum on executors
    * (never a driver map); each batch's merged state is materialized
    * with localCheckpoint (constant-size plan across batches, the
    * iterative-loop hygiene) and the superseded snapshot's blocks are
    * freed. `maxStateRows` fails the stream fast when the sketch
    * outgrows the bounded-state contract — the one count() per batch
    * that enforces it runs against the (tiny) sketch table, not the
    * data. Specs inject multi-file directories to force real
    * multi-batch merging. */
  def runSketchNow(spark: SparkSession, stream: DataFrame,
      groupCol: String, metricCol: String, binWidth: Long,
      maxStateRows: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.functions.sum
    // AtomicReference, not a plain var: foreachBatch runs on the
    // micro-batch thread and the caller reads the final master on its
    // own thread after awaitTermination — the atomic publish makes that
    // hand-off JMM-safe instead of relying on the stream's internal
    // synchronization (round-9 advice)
    val master = new java.util.concurrent.atomic.AtomicReference[Option[DataFrame]](None)
    val q: StreamingQuery = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val prev = master.get()
        val s = graft.ops.Profile
          .histQuantileSketch(batch, groupCol, metricCol, binWidth)
        val merged = prev.fold(s)(m => m.unionByName(s)
          .groupBy(groupCol, "bin").agg(sum("cnt").as("cnt")))
        val mat = merged.localCheckpoint(true)
        val n = mat.count()
        if (n > maxStateRows)
          throw new IllegalStateException(
            s"drift sketch state ($n rows) exceeds maxStateRows=" +
              s"$maxStateRows — raise binWidth or coarsen '$groupCol'")
        // free the superseded snapshot's blocks (the shared
        // checkpoint-RDD release — see ScaleHints.releaseCheckpoint for
        // the degrade-to-leak contract on a Spark upgrade)
        prev.foreach(graft.ops.ScaleHints.releaseCheckpoint)
        master.set(Some(mat))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    master.get().getOrElse(
      // no batches: a correctly-typed empty sketch via the same builder
      graft.ops.Profile.histQuantileSketch(
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          stream.schema),
        groupCol, metricCol, binWidth))
  }
}
