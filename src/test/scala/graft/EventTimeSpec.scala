package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import graft.ops.EventTime
import graft.streaming.{EventsStream, UpsertStream}

/** Dual-encoding regression: the SAME events written under every physical
  * `ts` encoding the driver has shipped (nanos-as-long int64,
  * TIMESTAMP(MICROS)/NTZ, plain TIMESTAMP) must produce IDENTICAL results
  * through both the batch reader and the streaming pipelines (t1 hourly
  * agg, t5 stream-stream join, t9 upsert). Round 5's regression was
  * exactly this: a hardcoded LongType stream schema read micros int64s
  * as nanos and silently landed every timestamp in 1970 — wrong answers
  * with rc=0. This spec pins the encoding-agnostic contract.
  */
class EventTimeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val base = new java.io.File(
    s"${System.getProperty("java.io.tmpdir")}/graft_enc_spec_${ProcessHandle.current().pid()}")

  /** Write `df` as a single file `<base>/<name>/events.parquet` (the
    * driver's layout: one bare parquet file, not a directory table). */
  private def writeSingle(df: DataFrame, name: String): String = {
    val dir = new java.io.File(base, name); dir.mkdirs()
    val tmp = new java.io.File(dir, "_tmp")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath,
      new java.io.File(dir, "events.parquet").toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    tmp.listFiles().foreach(_.delete()); tmp.delete()
    dir.toString
  }

  // canonical events (normalized once from the driver's current encoding)
  private lazy val canonical: DataFrame = EventTime.normalizeTs(
    spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    .select("event_id", "ts", "user_id", "event_type", "value", "props")

  // the three encodings under test
  private lazy val dirs: Map[String, String] = Map(
    "long_nanos" -> writeSingle(
      canonical.withColumn("ts", expr("unix_micros(ts) * 1000L")), "long_nanos"),
    "ntz_micros" -> writeSingle(
      canonical.withColumn("ts", col("ts").cast("timestamp_ntz")), "ntz_micros"),
    "timestamp" -> writeSingle(canonical, "timestamp"))

  test("the three encodings read back as three distinct physical types") {
    def tsType(d: String) = spark.read.parquet(s"$d/events.parquet").schema("ts").dataType
    assert(tsType(dirs("long_nanos")) == LongType)
    assert(tsType(dirs("ntz_micros")) == TimestampNTZType)
    assert(tsType(dirs("timestamp")) == TimestampType)
  }

  test("batch normalizeTs converges every encoding to identical rows") {
    val expected = canonical.collect().map(_.toSeq).toSet
    assert(expected.nonEmpty)
    dirs.foreach { case (enc, d) =>
      val got = EventTime.normalizeTs(spark.read.parquet(s"$d/events.parquet"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .collect().map(_.toSeq).toSet
      assert(got == expected, s"encoding $enc diverged from canonical")
    }
  }

  test("t1 hourly stream aggregate is identical across encodings") {
    val results = dirs.map { case (enc, d) =>
      val q = EventsStream.runAvailableNow(spark, d, s"enc_hourly_$enc")
      q.awaitTermination(120000)
      enc -> spark.table(s"enc_hourly_$enc").collect().map(_.toSeq).toSet
    }
    val ref = results("timestamp")
    assert(ref.nonEmpty)
    results.foreach { case (enc, got) =>
      assert(got == ref, s"t1 on $enc diverged (${got.size} vs ${ref.size} rows)")
    }
  }

  test("t5 stream-stream attribution join is identical across encodings") {
    val results = Seq("long_nanos", "ntz_micros").map { enc =>
      val q = EventsStream.runAttributionNow(spark, dirs(enc), s"enc_attr_$enc")
      q.awaitTermination(120000)
      enc -> spark.table(s"enc_attr_$enc").collect().map(_.toSeq).toSet
    }.toMap
    assert(results("long_nanos").nonEmpty)
    assert(results("long_nanos") == results("ntz_micros"))
  }

  test("t9 upsert snapshot is identical across encodings") {
    val results = Seq("long_nanos", "ntz_micros").map { enc =>
      val run = UpsertStream.runUpsertNow(spark, dirs(enc),
        s"$base/snap_$enc")
      run.query.awaitTermination(120000)
      enc -> run.snapshot().select("user_id", "ts", "event_id")
        .collect().map(_.toSeq).toSet
    }.toMap
    assert(results("long_nanos").nonEmpty)
    assert(results("long_nanos") == results("ntz_micros"))
  }
  test("batchSchema over an empty dir: fallback when given, clear error when not") {
    val empty = new java.io.File(base, "empty_dir")
    empty.mkdirs()
    val fb = new org.apache.spark.sql.types.StructType()
      .add("event_id", "long").add("ts", "timestamp")
    assert(EventTime.batchSchema(spark, empty.getAbsolutePath,
      emptyFallback = Some(fb)) == fb)
    val err = intercept[IllegalStateException] {
      EventTime.batchSchema(spark, empty.getAbsolutePath)
    }
    assert(err.getMessage.contains("at least one file"))
  }

}
