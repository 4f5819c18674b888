package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Sessionize

/** Custom-state streaming (flatMapGroupsWithState) vs the built-in
  * session_window batch plan: closed sessions must agree. */
class SessionizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)

  test("batch session_window groups by gap") {
    import spark.implicits._
    val df = Seq(
      (1L, ts(0), "a"), (1L, ts(10), "a"), (1L, ts(60), "a"),
      (2L, ts(5), "b")
    ).toDF("user_id", "ts", "event_type")
    val got = Sessionize.sessionsBatch(df, gapMinutes = 30)
      .orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
    assert(got.toList == List(
      (1L, ts(0), ts(40), 2L),   // events 0,10 → ends 10+30
      (1L, ts(60), ts(90), 1L),
      (2L, ts(5), ts(35), 1L)))
  }

  test("streaming flatMapGroupsWithState closes the same sessions") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Sessionize.Event]
    val q = Sessionize.sessions(input.toDS(), gapMinutes = 30)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_out").start()
    try {
      input.addData(
        Sessionize.Event(1L, ts(0), "a"), Sessionize.Event(1L, ts(10), "a"))
      q.processAllAvailable()
      // watermark advance past 10+30 closes session 1; new session opens
      input.addData(Sessionize.Event(1L, ts(60), "a"))
      q.processAllAvailable()
      input.addData(Sessionize.Event(1L, ts(120), "a"))
      q.processAllAvailable()
      val got = spark.sql("SELECT user_id, session_start, session_end, n_events FROM sess_out")
        .orderBy("session_start")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getInt(3)))
      assert(got.toList == List(
        (1L, ts(0), ts(40), 2),
        (1L, ts(60), ts(90), 1)))
    } finally q.stop()
  }
}
