package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType}

/** Physical-encoding-agnostic event-time ingestion.
  *
  * The driver regenerates the events table between rounds, and the
  * physical `ts` encoding has already flipped once: parquet
  * TIMESTAMP(NANOS) (which Spark surfaces as a LONG under
  * `spark.sql.legacy.parquet.nanosAsLong`) became TIMESTAMP(MICROS,
  * isAdjustedToUTC=false) (surfaced as TIMESTAMP_NTZ). A reader that
  * hardcodes one encoding either fails analysis or — worse — silently
  * misinterprets the integers (a micros int64 divided as if nanos lands
  * every timestamp in 1970). The reference never pins an encoding
  * either: pandas infers the type per file (fda_watcher.py:348), and
  * date-as-string columns are re-parsed on read (fda_watcher.py:305).
  *
  * So: branch on the ACTUAL column type, once, here — every batch query
  * and every stream goes through this object.
  */
object EventTime {

  /** Surface `tsCol` as a session-zone TIMESTAMP whatever its physical
    * type. The session timezone is pinned to UTC in every entrypoint
    * (Bench/Verify/tests), so the NTZ reinterpretation is
    * value-preserving; generator values are micro-aligned, so the
    * nanos→micros division is lossless.
    */
  def normalizeTs(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema(tsCol).dataType match {
      case LongType =>         // TIMESTAMP(NANOS) read as nanos-since-epoch
        df.withColumn(tsCol, expr(s"timestamp_micros($tsCol div 1000)"))
      case TimestampNTZType => // TIMESTAMP(MICROS), isAdjustedToUTC=false
        df.withColumn(tsCol, col(tsCol).cast("timestamp"))
      case _ => df             // already TimestampType (INT96 / adjusted micros)
    }

  /** The schema a file-source STREAM over `dir` must declare, derived
    * from the batch parquet footers instead of hardcoded — the stream
    * reads whatever encoding the files actually carry, and
    * [[normalizeTs]] above converges them. (Structured Streaming requires
    * an explicit schema on file sources; deriving it from the same files
    * the stream will read is the schema-inference the reference gets for
    * free from pandas.)
    *
    * PRECONDITIONS (footer inference, like any schema-on-read start):
    *  - If the glob matches NO file at stream start, inference is
    *    impossible; rather than throw where the old hardcoded schema
    *    allowed an empty dir, fall back to `emptyFallback` when given
    *    (the caller's best-known prior), else rethrow the inference
    *    error with the precondition spelled out.
    *  - Files arriving MID-STREAM are read under the start-time schema:
    *    a ts-encoding flip between files requires a stream restart (the
    *    new start re-infers). Mixed encodings within one running stream
    *    are not converged — same contract as any fixed-schema file
    *    source.
    */
  /** The empty-dir inference failure, recognized by ERROR CLASS first
    * (stable across Spark versions) with the message text as a fallback
    * for older builds that predate error classes — a reworded message
    * must not silently bypass `emptyFallback`. */
  private def isNoFilesToInfer(e: org.apache.spark.sql.AnalysisException): Boolean =
    (e.getErrorClass != null &&
      e.getErrorClass.contains("UNABLE_TO_INFER_SCHEMA")) ||
    (e.getMessage != null && e.getMessage.contains("Unable to infer schema"))

  def batchSchema(spark: SparkSession, dir: String,
      glob: String = "events.parquet",
      emptyFallback: Option[StructType] = None): StructType =
    try spark.read.option("pathGlobFilter", glob).parquet(dir).schema
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if emptyFallback.isDefined && isNoFilesToInfer(e) =>
        emptyFallback.get
      case e: org.apache.spark.sql.AnalysisException if isNoFilesToInfer(e) =>
        throw new IllegalStateException(
          s"EventTime.batchSchema: no file matching '$glob' under $dir at " +
          "stream start — footer inference needs at least one file; pass " +
          "emptyFallback to start a stream over a not-yet-populated dir", e)
    }
}
