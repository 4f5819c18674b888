package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{Tagging, TextAnalysis}

/** Streaming curation — the incremental form of the Dolma-style
  * tag-then-filter gate in [[graft.ops.Tagging]]. Tagging and rule
  * application are pure stateless projections, so the SAME rule set that
  * curates a batch corpus runs unchanged over a document stream: no
  * state store, no watermark, every micro-batch curated independently
  * and the union of micro-batch outputs equals the batch answer by
  * construction. This is the shape that matters operationally — a
  * continuously-ingesting corpus gets its quality gate at arrival time,
  * not in a nightly rescan. */
object CurateStream {

  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def readDocuments(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(documentsSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)

  /** Tag + rule-gate a document stream (batch or streaming input). */
  def curate(docs: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    Tagging.applyRules(
      docs.select(col("doc_id") +: TextAnalysis.qualityScore(col("text")): _*),
      rules)
      .select("doc_id", "n_tokens", "drop_reasons", "keep")

  /** Run the rule gate over `dir`'s documents as an ACTUAL stream
    * (AvailableNow → memory sink). Stateless: output rows are
    * micro-batch-order-independent, hence batch-oracle-checkable. */
  def runCurateNow(spark: SparkSession, dir: String, queryName: String,
      rules: Seq[(String, Column)]): org.apache.spark.sql.streaming.StreamingQuery =
    curate(readDocuments(spark, dir), rules)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
}
