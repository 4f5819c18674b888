package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{DedupStream, EventsStream}

/** T1/T2 as Structured Streaming: the events parquet drives an
  * AvailableNow micro-batch run; the result must equal the equivalent
  * batch aggregation (streaming-batch unification is the point). */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("availableNow hourly aggregate equals the batch plan") {
    val dir = "/root/testdata/sf0.001"
    val q = EventsStream.runAvailableNow(spark, dir, "stream_hourly")
    q.awaitTermination(120000)

    val streamed = spark.sql(
      "SELECT hour_ts, event_type, n_events FROM stream_hourly")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    val batch = graft.ops.EventTime.normalizeTs(
        spark.read.parquet(s"$dir/events.parquet"))
      .groupBy(date_trunc("hour", col("ts")).as("hour_ts"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("stream-static dim enrichment equals the batch join") {
    val dir = "/root/testdata/sf0.001"
    val dim = spark.read.parquet(s"$dir/supplier.parquet")
      .select(col("s_suppkey"), col("s_nationkey"))
    val q = EventsStream.runEnrichNow(spark, dir, dim,
      col("user_id") % 100, col("s_suppkey"), "stream_enrich")
    q.awaitTermination(120000)

    val streamed = spark.sql(
      "SELECT event_id, s_nationkey FROM stream_enrich")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .join(dim, col("user_id") % 100 === col("s_suppkey"), "left")
      .select("event_id", "s_nationkey")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("stream-stream attribution join equals the batch range join") {
    val dir = "/root/testdata/sf0.001"
    val q = EventsStream.runAttributionNow(spark, dir, "stream_attr")
    q.awaitTermination(120000)
    val streamed = spark.sql("SELECT purchase_id, click_id FROM stream_attr")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val e = graft.ops.EventTime.normalizeTs(
      spark.read.parquet(s"$dir/events.parquet"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("pu"), col("ts").as("pts"))
    val c = e.filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id").as("cu"), col("ts").as("cts"))
    val batch = p.join(c, col("pu") === col("cu") &&
        col("cts") >= col("pts") - expr("INTERVAL 30 MINUTES") &&
        col("cts") <= col("pts"))
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet

    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming dedup: forever-state drops re-ingested keys across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val q = DedupStream.exactForever(
        input.toDF().toDF("rag_id", "payload"), Seq("rag_id"))
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_out").start()
    try {
      input.addData(("a", "v1"), ("b", "v1"), ("a", "v1dup"))
      q.processAllAvailable()
      // re-scrape in a LATER batch: both keys already in state
      input.addData(("a", "v2"), ("b", "v2"), ("c", "v1"))
      q.processAllAvailable()
      val got = spark.sql("SELECT rag_id, payload FROM dedup_out")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(got == Set(("a", "v1"), ("b", "v1"), ("c", "v1")))
    } finally q.stop()
  }

  test("streaming dedup: watermark-bounded state suppresses in-window dups, evicts old keys") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def ts(min: Int) = java.sql.Timestamp.valueOf(s"2026-01-01 ${10 + min / 60}:${"%02d".format(min % 60)}:00")
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val q = DedupStream.exactWithinWatermark(
        input.toDF().toDF("rag_id", "ts"), Seq("rag_id"), "ts", "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_wm_out").start()
    try {
      input.addData(("a", ts(0)), ("a", ts(5)))        // dup inside window
      q.processAllAvailable()
      input.addData(("x", ts(60)))                     // advance watermark far
      q.processAllAvailable()
      input.addData(("a", ts(65)))                     // key a's state evicted → re-emitted
      q.processAllAvailable()
      val got = spark.sql("SELECT rag_id, ts FROM dedup_wm_out")
        .collect().map(r => (r.getString(0), r.getTimestamp(1))).toList.sorted
      assert(got == List(("a", ts(0)), ("a", ts(65)), ("x", ts(60))).sorted)
    } finally q.stop()
  }

  test("windowed agg drops watermark-late rows and reports them in progress metrics") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit, window}
    implicit val sq = spark.sqlContext
    def ts(min: Int) = java.sql.Timestamp.valueOf(
      s"2026-01-01 ${10 + min / 60}:${"%02d".format(min % 60)}:00")
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val agg = input.toDF().toDF("k", "ts")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("k"))
      .agg(count(lit(1)).as("n"))
      .select(col("k"), col("n"))
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("late_out").start()
    try {
      input.addData(("a", ts(0)), ("a", ts(5)))
      q.processAllAvailable()
      input.addData(("b", ts(60))) // watermark → 50 min; window [0,10) closes
      q.processAllAvailable()
      input.addData(("late", ts(2))) // 48 min past watermark → DROPPED
      q.processAllAvailable()
      val got = spark.sql("SELECT k, n FROM late_out").collect()
        .map(r => (r.getString(0), r.getLong(1))).toList.sorted
      // the late row never surfaces, and b's window is still open
      assert(got == List(("a", 2L)), got.toString)
      // the drop is OBSERVABLE, not silent — ops dashboards alert on this
      val dropped = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
      assert(dropped >= 1, s"expected numRowsDroppedByWatermark ≥ 1, got $dropped")
    } finally q.stop()
  }

  test("streaming curation gate equals the batch rule application") {
    import graft.streaming.CurateStream
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val rules = Seq(
      "too_short" -> (col("n_tokens") >= 40),
      "low_diversity" -> (col("n_uniq") * 10 >= col("n_tokens") * 3))
    val q = CurateStream.runCurateNow(spark, dir, "curate_stream_out", rules)
    q.awaitTermination()
    val streamed = spark.table("curate_stream_out")
      .collect().map(_.toSeq).toSet
    val batch = CurateStream.curate(
        spark.read.parquet(s"$dir/documents.parquet"), rules)
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("ProcessingTime trigger drains multiple micro-batches on a cadence") {
    // the reference's daemon scheduler (a sleep-loop re-running the
    // pipeline on a fixed period) maps onto Trigger.ProcessingTime: the
    // query stays up and fires a micro-batch every interval — unlike
    // AvailableNow, which drains and stops. Two addData rounds must
    // surface in two distinct batches.
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "v")
      .writeStream.outputMode("append").format("memory")
      .queryName("pt_out")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      input.addData((3L, "c"))
      q.processAllAvailable()
      val got = spark.sql("SELECT id FROM pt_out").collect().map(_.getLong(0)).toSet
      assert(got == Set(1L, 2L, 3L))
      // ≥2 distinct batch ids: the cadence actually re-fired, the second
      // round was not folded into the first drain
      assert(q.recentProgress.map(_.batchId).distinct.length >= 2,
        q.recentProgress.map(_.batchId).mkString(","))
    } finally q.stop()
  }

  test("foreachBatch upsert over 3 micro-batches equals the batch argmax") {
    import graft.streaming.UpsertStream
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_t9_spec_" +
      ProcessHandle.current().pid()
    // split events into 3 files so maxFilesPerTrigger=1 forces 3 merges
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    (0 until 3).foreach { i =>
      events.filter(col("event_id") % 3 === i)
        .write.mode("overwrite").parquet(s"$base/in/part$i.parquet")
    }
    // the file-source treats each partN.parquet dir's file as one input;
    // flatten them into one dir of 3 files
    val flat = new java.io.File(s"$base/flat"); flat.mkdirs()
    (0 until 3).foreach { i =>
      val src = new java.io.File(s"$base/in/part$i.parquet").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      src.zipWithIndex.foreach { case (f, j) =>
        java.nio.file.Files.copy(f.toPath,
          new java.io.File(flat, s"b${i}_$j.parquet").toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    val run = UpsertStream.runUpsertNow(spark, s"$base/flat",
      s"$base/snap", maxFilesPerTrigger = Some(1), glob = "*.parquet")
    run.query.awaitTermination(120000)
    // >= 2 versions means the merge path (read vN, write vN+1) actually ran
    val versions = new java.io.File(s"$base/snap").listFiles()
      .count(_.getName.startsWith("v"))
    assert(versions >= 2, s"expected multi-batch merge, got $versions versions")

    val streamed = run.snapshot()
      .select("user_id", "ts", "event_id")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    val batch = UpsertStream.latestPerKey(
        graft.ops.EventTime.normalizeTs(events),
        "user_id", "ts", "event_id")
      .select("user_id", "ts", "event_id")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
