package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scan-side operators (SURVEY §2.1 S2/S3/S5; S1's HTML parse is
  * [[graft.ops.HtmlExtract]] over a fetched page column, S4's master state
  * is plain parquet). All wrap Spark's native readers — file listing,
  * partitioned scan, schema inference, predicate pushdown come free.
  */
object Sources {

  /** S2 — one consolidated JSON file (array-of-records or single object);
    * Spark's multiLine reader normalizes both shapes
    * (reference: json.load + list-normalize, json_split_and_clean.py:277-280). */
  def jsonBatch(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)

  /** S3 — every *.json under a directory tree, with file identity retained
    * (reference: rglob + sort, combine_json_to_jsonl.py:126-151). The
    * reference's deterministic file order becomes an explicit column —
    * row order is not a distributed-table property. */
  def jsonDirRecursive(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .option("multiLine", "true")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.json")
      .json(dir)
      .withColumn("src_file", input_file_name())

  /** S5 — binary documents (PDFs in the reference,
    * pdf_marker_extraction.py:336): (path, modificationTime, length, content). */
  def binaryFiles(spark: SparkSession, dir: String, glob: String = "*.pdf"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)

  /** CSV source (engine-surface extension, pairs with [[Sinks.writeCsv]]):
    * explicit schema — schema inference is a full extra pass over the
    * data, never acceptable at corpus scale — and the same quote/escape
    * dialect the sink writes, so quoted delimiters and newlines survive. */
  def csvTable(spark: SparkSession, path: String, schemaDDL: String): DataFrame =
    spark.read
      .schema(schemaDDL)
      .option("header", "true").option("escape", "\"")
      .option("multiLine", "true")
      .csv(path)

  /** U2 — multi-directory union as a single multi-path scan
    * (combine_json_to_jsonl.py:337-359): one job, parallel listing. */
  def jsonMultiDir(spark: SparkSession, dirs: Seq[String]): DataFrame =
    spark.read.option("multiLine", "true").option("recursiveFileLookup", "true")
      .json(dirs: _*)
      .withColumn("src_file", input_file_name())
}
