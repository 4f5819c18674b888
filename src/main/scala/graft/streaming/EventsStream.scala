package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming/incremental semantics (SURVEY §2.9 T1/T2) as Structured
  * Streaming — the reference's daily scheduler + delta-mode watcher
  * (scheduler.py:116, fda_watcher.py:373-416) maps onto a file-source
  * stream with checkpointing: initial load = first micro-batch, delta =
  * every subsequent one, "synchronized" = an empty batch; the master-state
  * bookkeeping the reference hand-rolls comes from the source's exactly-
  * once file tracking.
  *
  * Beyond reference parity (it has no event-time semantics): watermarked
  * tumbling-window aggregation over the `events` table, the canonical
  * Spark streaming shape.
  */
object EventsStream {

  /** T1 — file-source stream over an events directory. The declared
    * schema is DERIVED from the batch parquet footers, not hardcoded
    * ([[graft.ops.EventTime.batchSchema]]): a hardcoded LongType `ts`
    * against TIMESTAMP(MICROS) files made the reader hand back raw
    * micros int64s that the nanos conversion then shrank 1000× — wrong
    * answers with rc=0, the worst failure class. Deriving the schema
    * from the same files the stream reads, then normalizing the type
    * ([[graft.ops.EventTime.normalizeTs]]), keeps the stream
    * encoding-agnostic exactly like the batch path. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    graft.ops.EventTime.normalizeTs(
      spark.readStream
        .schema(graft.ops.EventTime.batchSchema(spark, dir))
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))

  /** T2-extension — watermarked hourly windowed aggregate. The value sum
    * accumulates in DECIMAL so the result is independent of micro-batch
    * arrival order (float addition is not associative; a stream must
    * not answer differently from the batch plan because files arrived
    * in a different order). */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("value_sum"))
      .select(col("window.start").as("hour_ts"), col("event_type"),
        col("n_events"), col("value_sum"))

  /** Run the hourly aggregate over whatever is in `dir` right now
    * (Trigger.AvailableNow) into an in-memory sink; returns the query.
    * Complete mode: the memory sink holds the full aggregate state —
    * appropriate for a bounded smoke run, not production. */
  def runAvailableNow(spark: SparkSession, dir: String,
      queryName: String, statePartitions: Int = 8): StreamingQuery =
    // statePartitions: see [[runAttributionNow]] — stateful-shuffle width
    // pinned at first start, sized to micro-batch volume not batch conf
    // (measured on the sf0.1 join: 32 partitions ≈ 2.5× slower than 8
    // from per-partition state-store commit overhead alone)
    withShufflePartitions(spark, statePartitions) {
      hourlyAgg(readEvents(spark, dir))
        .writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
    }

  /** T5 — stream-stream inner join with an event-time range condition:
    * each purchase matched to the same user's clicks in the preceding
    * 30 minutes (last-touch attribution). Both sides carry watermarks,
    * which is what bounds the join state: once the purchase-side
    * watermark passes click_ts + 30 min, that click can never match a
    * future purchase and its state-store entry is evicted — the state
    * held at any instant is one watermark-window of clicks per user,
    * independent of total stream length. Inner-join matches surface in
    * the micro-batch where both sides are present (append mode emits
    * them immediately; only EVICTION waits on the watermark).
    *
    * Per-side column names (p_user/c_user) — a self-join of one source
    * with the same name on both sides silently degrades the equi
    * condition (see graft-wide self-join rule). */
  def attributionJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    purchases.join(clicks,
        col("p_user") === col("c_user") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 30 MINUTES") &&
        col("click_ts") <= col("purchase_ts"))
      .select(col("purchase_id"), col("click_id"),
        col("p_user").as("user_id"), col("purchase_ts"), col("click_ts"))
  }

  /** Run the attribution join over `dir` (AvailableNow, append mode →
    * memory sink). The sf parquet arrives as one file = one micro-batch,
    * so every click is in state before any purchase probes it; with
    * files split across micro-batches the 1-hour watermark delay keeps
    * a full join window of clicks resident between batches.
    *
    * `statePartitions` sizes the STATEFUL shuffle independently of the
    * session's batch `spark.sql.shuffle.partitions`: a stream-stream
    * join commits 4 state stores per partition per micro-batch (two per
    * side), so per-batch overhead scales with the partition count while
    * throughput scales with rows — MB-scale micro-batches want few
    * partitions, a production firehose wants ≈cores. The value is
    * pinned into the checkpoint at first start (Spark reads the conf at
    * query start), which is why it is set around `.start()` and
    * restored immediately after. */
  def runAttributionNow(spark: SparkSession, dir: String,
      queryName: String, statePartitions: Int = 8): StreamingQuery =
    withShufflePartitions(spark, statePartitions) {
      attributionJoin(readEvents(spark, dir))
        .writeStream
        .outputMode("append")
        .format("memory")
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
    }

  /** Static-dimension enrichment — THE everyday streaming join: each
    * micro-batch of the event stream hash-joins a bounded static dim
    * (stream-static joins need no watermark and keep NO state store —
    * the dim is just re-planned per micro-batch, broadcast when small).
    * The output is a stateless projection of each micro-batch, so the
    * stream's union equals the batch join — the oracle replays it as a
    * plain JOIN. `dim` must be a BATCH frame. */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
      eventKey: org.apache.spark.sql.Column,
      dimKey: org.apache.spark.sql.Column): DataFrame =
    events.join(graft.ops.ScaleHints.maybeBroadcast(dim),
      eventKey === dimKey, "left")

  /** Run the dim-enrichment stream over `dir`'s events right now. */
  def runEnrichNow(spark: SparkSession, dir: String, dim: DataFrame,
      eventKey: org.apache.spark.sql.Column,
      dimKey: org.apache.spark.sql.Column, queryName: String,
      statePartitions: Int = 8): StreamingQuery =
    withShufflePartitions(spark, statePartitions) {
      enrichWithDim(readEvents(spark, dir), dim, eventKey, dimKey)
        .writeStream
        .outputMode("append")
        .format("memory")
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
    }

  /** Dim-enrichment into a PARQUET sink — the scale shape: the memory
    * sink above collects every enriched row into the DRIVER (fine for
    * MB-scale demos, a single-threaded wall at corpus scale — it was the
    * whole super-linear term in the 10× bench), while the file sink
    * writes micro-batches executor-side in parallel and commits them via
    * the sink log. Read the result back with `spark.read.parquet(out)`.
    * `out` must be fresh per run (the sink log pins batch ids). */
  def runEnrichToParquet(spark: SparkSession, dir: String, dim: DataFrame,
      eventKey: org.apache.spark.sql.Column,
      dimKey: org.apache.spark.sql.Column, out: String,
      statePartitions: Int = 8): StreamingQuery =
    withShufflePartitions(spark, statePartitions) {
      enrichWithDim(readEvents(spark, dir), dim, eventKey, dimKey)
        .writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", s"$out/data")
        .option("checkpointLocation", s"$out/chk")
        .trigger(Trigger.AvailableNow())
        .start()
    }

  /** Session conf is shared state: serialize concurrent runners on the
    * context so interleaved set/restore cannot leave the session pinned
    * at the temporary value. (StreamExecution clones the session inside
    * start(), so the restore after start is safe for the stream itself;
    * batch queries PLANNED on other threads during the window would
    * still observe n — callers needing full isolation should start the
    * stream from `spark.newSession()` and read the sink table there.) */
  private[streaming] def withShufflePartitions[A](spark: SparkSession, n: Int)(f: => A): A =
    spark.sparkContext.synchronized {
      val key = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(key)
      spark.conf.set(key, n.toString)
      try f finally spark.conf.set(key, prev)
    }
}
