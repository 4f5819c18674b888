package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** T9 — foreachBatch merge-upsert: the production streaming-sink pattern
  * the reference's master-file update loop approximates by hand
  * (fda_watcher.py:373-416 re-reads the master, overlays the delta and
  * rewrites the file each cycle). Here each micro-batch MERGEs into a
  * keyed snapshot: one row per key holding the latest event by
  * `(ts, event_id)`.
  *
  * Scale shape (the Delta/Iceberg `MERGE INTO` contract, expressed over
  * plain parquet so it stays dependency-free):
  *
  *  - The snapshot is a versioned parquet table (`v1`, `v2`, …) with the
  *    current version an atomic in-memory pointer; a batch reads `vN`
  *    and writes `vN+1`, never overwriting the version it reads, so a
  *    crashed batch leaves the last snapshot intact (write-ahead, not
  *    in-place).
  *  - Each batch first collapses to ONE row per key (its own latest) —
  *    the merge join is keyed and bounded by |snapshot keys| + |batch
  *    keys| regardless of batch row count.
  *  - Merge = union + keyed argmax. Rows are unique by `event_id`, so
  *    the per-key `(ts, event_id)` order is total and the result is
  *    independent of micro-batch arrival order — the stream answers
  *    exactly what the batch argmax over all events answers, which is
  *    what makes this oracle-checkable.
  *  - State lives in the TABLE, not the state store: no watermark, no
  *    per-key streaming state, restart cost is a pointer read. This is
  *    the right regime when the keyed snapshot itself is the product
  *    (a serving table), vs `flatMapGroupsWithState` when only derived
  *    per-key aggregates are needed.
  */
object UpsertStream {

  /** One row per key: the latest by (tsCol, tieCol). `tieCol` must be
    * unique per row (event_id), making the survivor deterministic. */
  def latestPerKey(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Handle to a running upsert stream: the query plus a reader for the
    * current snapshot version (valid once the query terminates, or
    * between batches). */
  final case class UpsertRun(query: StreamingQuery, snapshot: () => DataFrame)

  /** Stream `dir`'s events (AvailableNow) and merge each micro-batch
    * into the versioned snapshot under `snapshotRoot`. */
  def runUpsertNow(spark: SparkSession, dir: String, snapshotRoot: String,
      keyCol: String = "user_id", statePartitions: Int = 8,
      maxFilesPerTrigger: Option[Int] = None,
      glob: String = "events.parquet"): UpsertRun = {
    val version = new AtomicInteger(0)
    def snapshotAt(v: Int): DataFrame = spark.read.parquet(s"$snapshotRoot/v$v")

    // stream schema derived from the batch footers + type-branched ts
    // normalization — same encoding-agnostic path as EventsStream.readEvents
    val reader = spark.readStream
      .schema(graft.ops.EventTime.batchSchema(spark, dir, glob))
      .option("pathGlobFilter", glob)
    val withTrigger = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
    val events = graft.ops.EventTime.normalizeTs(withTrigger.parquet(dir))

    val query = EventsStream.withShufflePartitions(spark, statePartitions) {
      events.writeStream
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val batchLatest = latestPerKey(batch, keyCol, "ts", "event_id")
          val v = version.get()
          val merged =
            if (v == 0) batchLatest
            else latestPerKey(snapshotAt(v).unionByName(batchLatest),
              keyCol, "ts", "event_id")
          // write materializes the read of vN; only then advance the pointer
          merged.write.mode("overwrite").parquet(s"$snapshotRoot/v${v + 1}")
          version.incrementAndGet()
          ()
        }
        .start()
    }
    UpsertRun(query, () => snapshotAt(version.get()))
  }
}
