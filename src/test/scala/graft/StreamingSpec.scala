package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.EventsStream

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

    val batch = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .groupBy(date_trunc("hour", col("ts")).as("hour_ts"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
