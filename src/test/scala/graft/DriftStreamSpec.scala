package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Profile
import graft.streaming.DriftStream

/** Streaming sketch fold: multi-micro-batch accumulation must equal the
  * one-pass batch sketch (merge is addition). */
class DriftStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("foreachBatch sketch fold over 2+ micro-batches equals batch build") {
    val dir = java.nio.file.Files.createTempDirectory("drift_stream").toString
    val docs = (1L to 300L)
      .map(i => (i, s"s${i % 3}", (i * 37 % 900).toInt))
      .toDF("doc_id", "source", "n_chars")
    // two separate files → maxFilesPerTrigger=1 forces ≥2 micro-batches
    docs.filter($"doc_id" <= 150).coalesce(1)
      .write.parquet(s"$dir/documents.parquet/part1")
    docs.filter($"doc_id" > 150).coalesce(1)
      .write.mode("append").parquet(s"$dir/documents.parquet/part1")
    // read back to confirm layout then stream the directory
    val schema = docs.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/documents.parquet/part1")
    val merged = DriftStream.runSketchNow(spark, stream,
      "source", "n_chars", binWidth = 100L)
    val batch = Profile.histQuantileSketch(docs, "source", "n_chars", 100L)
    def toSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(toSet(merged) == toSet(batch))
    // and the PSI downstream of the folded sketch matches the batch path
    val prior = docs.filter($"doc_id" % 2 === 0)
    val psiStream = Profile.psiFromSketches(merged,
      Profile.histQuantileSketch(prior, "source", "n_chars", 100L), "source")
    val psiBatch = Profile.psiDrift(docs, prior, "source", "n_chars", 100L)
    assert(toSet(psiStream.select($"source", $"n_bins", $"psi_micro")) ==
      toSet(psiBatch.select($"source", $"n_bins", $"psi_micro")))
  }

  test("high-cardinality group column fails fast at the maxStateRows cap") {
    val dir = java.nio.file.Files.createTempDirectory("drift_hc").toString
    // every row its own group: sketch state = one row per doc — far
    // over a cap of 10, so the stream must die with the actionable
    // message instead of silently accumulating unbounded state
    val docs = (1L to 300L)
      .map(i => (i, s"g$i", (i * 37 % 900).toInt))
      .toDF("doc_id", "source", "n_chars")
    docs.coalesce(1).write.parquet(s"$dir/d.parquet")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/d.parquet")
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      DriftStream.runSketchNow(spark, stream, "source", "n_chars",
        binWidth = 100L, maxStateRows = 10L)
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(e => e +: causes(e.getCause))
    assert(causes(ex).exists(c =>
      c.isInstanceOf[IllegalStateException] &&
        c.getMessage.contains("maxStateRows")))
  }
}
