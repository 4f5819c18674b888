package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming deduplication — the incremental form of the reference's
  * idempotent-ingest guarantee (D1, fda_watcher.py:86-93: "the ID is
  * always the same for the same drug" so a re-scrape never re-ingests)
  * and of the batch dedup family in [[graft.ops.Dedup]].
  *
  * Two state regimes, both bounded — at 100 TB of stream history the
  * difference between them is whether state grows forever:
  *
  *  - [[exactForever]]: `dropDuplicates(keys)` — state holds every key
  *    seen since the stream started. Correct for bounded key universes
  *    (the reference's drug-label RAG_IDs), a state-size time bomb for
  *    unbounded ones. Kept because it IS the reference's semantics.
  *  - [[exactWithinWatermark]]: `dropDuplicatesWithinWatermark(keys)` —
  *    duplicates are only suppressed while their event time is above the
  *    watermark, and state for older keys is evicted. The right default
  *    for unbounded streams: re-ingest storms are near-duplicates in
  *    time, so a delay-bounded window catches them at fixed state size.
  */
object DedupStream {

  /** Forever-state exact dedup on `keys` (reference D1 semantics).
    * Input may be batch or streaming; on a stream the engine keeps one
    * state row per distinct key. */
  def exactForever(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** Watermark-bounded exact dedup: suppress duplicate `keys` arriving
    * within `delay` of each other (event time `tsCol`), with state
    * evicted once the watermark passes. Streaming input only —
    * `withWatermark` requires it. */
  def exactWithinWatermark(df: DataFrame, keys: Seq[String],
      tsCol: String, delay: String): DataFrame =
    df.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Content-hash key for streams whose natural key is the payload
    * itself (D2 composed with streaming dedup). */
  def contentKey(c: Column): Column = md5(c)

  /** Run forever-state key dedup over `dir`'s events as an ACTUAL stream
    * (AvailableNow → memory sink): keys are projected BEFORE the dedup,
    * so the emitted set is exactly the distinct key set — deterministic
    * regardless of which arrival survived, hence batch-oracle-checkable
    * (SELECT DISTINCT). State sizing per [[EventsStream.runAttributionNow]]. */
  def runDedupKeysNow(spark: org.apache.spark.sql.SparkSession, dir: String,
      queryName: String, keys: Seq[String],
      statePartitions: Int = 8): org.apache.spark.sql.streaming.StreamingQuery =
    EventsStream.withShufflePartitions(spark, statePartitions) {
      exactForever(
          EventsStream.readEvents(spark, dir).select(keys.map(col): _*), keys)
        .writeStream
        .outputMode("append")
        .format("memory")
        .queryName(queryName)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
}
