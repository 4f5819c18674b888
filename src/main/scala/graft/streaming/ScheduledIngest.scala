package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.pipeline.FdaPipeline

/** The reference's daemon scheduler as a Structured Streaming driver
  * (fda_rag_extraction/scripts/scheduler.py:116-123: schedule.every().day
  * → run the watcher): a file-source stream watches the scrape landing
  * directory, and each trigger tick runs the WHOLE FDA ingest lifecycle
  * ([[FdaPipeline.run]]) on exactly the files that arrived since the
  * last tick — Spark's checkpointed file tracking is the "what did I
  * already process" state the reference keeps in its Excel master +
  * cron lockfile.
  *
  * Per tick (foreachBatch):
  *  - the batch's records fingerprint + anti-join against the persisted
  *    master, so re-scraped known records are no-ops (delta-only, T2)
  *  - publishable records land in `publishDir/batch=<id>` (JSONL, S9;
  *    per-batch overwrite, so a foreachBatch retry is idempotent)
  *  - gate-failing NEW records land in `quarantineDir/batch=<id>` — the
  *    manual-review split (S10); they are NOT entered into master, so a
  *    later scrape of the same page retries them
  *  - the master parquet is atomically replaced (write-new → swap) with
  *    the union update (U1)
  *
  * The default trigger is `ProcessingTime(24 hours)` — the daily
  * schedule; tests drive it with a fast trigger. `Trigger.AvailableNow`
  * turns the same driver into a catch-up batch run (process everything
  * pending, then stop) — the reference's "run once now" mode.
  *
  * Scale notes: the master re-write is per-tick sequential state like
  * any streaming sink commit; at 100 TB the master would be a bucketed
  * table ([[graft.sources.Sinks.writeBucketedMaster]]) and the swap a
  * metastore pointer flip, but the per-tick dataflow — batch-sized
  * work, master read once, delta-only downstream — is already the
  * cluster shape. */
object ScheduledIngest {

  /** Scrape landing-file schema: one JSON record per scraped listing
    * row (url, title, description, date, text). */
  val freshSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("date", StringType),
    StructField("text", StringType)))

  /** Master persisted schema — the cleaned record plus its fingerprint. */
  val masterSchema: StructType = StructType(Seq(
    StructField("rag_id", StringType),
    StructField("url", StringType),
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("date", StringType),
    StructField("corpus", StringType)))

  /** One tick's outcome, reported to `onTick` (the run-report logging of
    * scheduler.py / fda_watcher's summary counters, as data). */
  case class Tick(batchId: Long, nFresh: Long, nPublished: Long,
      nQuarantined: Long, nMaster: Long)

  private def fsFor(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def loadMaster(spark: SparkSession, masterDir: String): DataFrame = {
    val (fs, p) = fsFor(spark, masterDir)
    def complete(d: org.apache.hadoop.fs.Path): Boolean =
      fs.exists(new org.apache.hadoop.fs.Path(d, "_SUCCESS"))
    // crash recovery for the two-rename swap: if the daemon died between
    // "dir → .old" and ".next → dir", masterDir is missing but a COMPLETE
    // copy exists next door — .next (the new state, fully written before
    // any rename) wins over .old (the prior state). Without this, a
    // crash in that window would silently restart from an empty master.
    if (!complete(p)) {
      val next = new org.apache.hadoop.fs.Path(s"$masterDir.next")
      val old = new org.apache.hadoop.fs.Path(s"$masterDir.old")
      if (complete(next)) fs.rename(next, p)
      else if (complete(old)) fs.rename(old, p)
    }
    if (complete(p)) spark.read.parquet(masterDir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], masterSchema)
  }

  /** Replace the master atomically enough for a single-writer daemon:
    * the new master materializes to a side directory FIRST (reading the
    * old master is finished by then — the union update is materialized
    * there), then swaps in via filesystem renames (Hadoop FileSystem
    * API — local FS in tests, HDFS/object-store semantics on a
    * cluster; on S3-like stores the production form is a metastore /
    * table-format pointer flip, same dataflow). A crash between the
    * renames leaves the side directory complete on disk; the next
    * tick's load sees the old or the new master, never a half-written
    * one. */
  private def swapMaster(updated: DataFrame, masterDir: String): Long = {
    val next = s"$masterDir.next"
    updated.write.mode("overwrite").parquet(next)
    val spark = updated.sparkSession
    val n = spark.read.parquet(next).count()
    val (fs, dir) = fsFor(spark, masterDir)
    val nextP = new org.apache.hadoop.fs.Path(next)
    val oldP = new org.apache.hadoop.fs.Path(s"$masterDir.old")
    if (fs.exists(oldP)) fs.delete(oldP, true)
    if (fs.exists(dir)) fs.rename(dir, oldP)
    fs.rename(nextP, dir)
    fs.delete(oldP, true)
    n
  }

  /** Start the daemon. `incomingDir` receives scrape landing files
    * (JSONL, [[freshSchema]]); `runDateOf(batchId)` pins each tick's
    * "today" (determinism over current_date — tests pass a constant). */
  /** Optional human-facing interchange: when `masterXlsxPath` is set,
    * each tick also re-exports the updated master as a real .xlsx —
    * the reference's daily job maintains exactly this file
    * (fda_watcher.py:555 to_excel). Bounded by [[Xlsx.writeMaster]]'s
    * collect cap; the engine's source of truth stays the parquet. */
  def start(spark: SparkSession, incomingDir: String, masterDir: String,
      publishDir: String, quarantineDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("24 hours"),
      runDateOf: Long => String = _ => java.time.LocalDate.now().toString,
      source: String = "fda_oncology",
      masterXlsxPath: Option[String] = None,
      onTick: Tick => Unit = _ => ()): StreamingQuery = {
    val fresh = spark.readStream.schema(freshSchema).json(incomingDir)
    fresh.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        runTick(spark, batch, batchId, masterDir, publishDir,
          quarantineDir, runDateOf, source, masterXlsxPath, onTick)
      }
      .start()
  }

  /** One tick of the ingest lifecycle over a batch of fresh records
    * ([[freshSchema]]): fingerprint + delta anti-join against the
    * master, publish/quarantine split, master swap, optional .xlsx
    * re-export, tick report. Shared by the JSONL-landing driver
    * ([[start]]) and the HTML-page driver ([[startHtml]]). */
  private def runTick(spark: SparkSession, batch: DataFrame, batchId: Long,
      masterDir: String, publishDir: String, quarantineDir: String,
      runDateOf: Long => String, source: String,
      masterXlsxPath: Option[String], onTick: Tick => Unit): Unit = {
    val b = batch.persist()
    // published/quarantined plans re-read masterDir on every action,
    // so BOTH are pinned (persist) and written BEFORE the master
    // swap — an action after the swap would anti-join the updated
    // master and see an empty delta
    val master = loadMaster(spark, masterDir)
    val res = FdaPipeline.run(b, master, runDateOf(batchId), source)
    val p = res.published.persist()
    val q = res.quarantined.persist()
    try {
      // per-batch overwrite (not a flat append): a foreachBatch RETRY
      // after a partial tick must not duplicate records — re-running
      // batch N rewrites batch=N in place, so publish is idempotent
      // like the quarantine split. Readers see one partitioned tree.
      p.write.mode("overwrite").json(s"$publishDir/batch=$batchId")
      q.write.mode("overwrite").json(s"$quarantineDir/batch=$batchId")
      val (np, nq) = (p.count(), q.count())
      val nm = swapMaster(res.updatedMaster, masterDir)
      masterXlsxPath.foreach(x =>
        graft.sources.Xlsx.writeMaster(spark.read.parquet(masterDir), x))
      onTick(Tick(batchId, b.count(), np, nq, nm))
    } finally { p.unpersist(); q.unpersist(); b.unpersist() }
  }

  /** Per-fetched-detail-page schema for [[startHtml]]'s text join:
    * one JSON record per fetched detail page (url → extracted text),
    * maintained by the pluggable fetcher. */
  val detailSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("text", StringType)))

  /** The FULL §3.1 lifecycle as one runnable daily driver, fronted by
    * the DSv2 listing source: the stream watches `incomingHtmlDir` for
    * freshly-fetched listing PAGES (*.html — what the reference's
    * requests session writes, fda_watcher.py:274-355), and each tick
    *
    *  1. parses exactly the pages that arrived since the last tick via
    *     `spark.read.format("graft-html").load(newFiles…)` — the
    *     listing-table gate (`n_cells >= minCells`) pushes INTO that
    *     scan (S1),
    *  2. joins each listing row's url against the fetcher-maintained
    *     detail-text directory ([[detailSchema]] JSONL; a url without a
    *     fetched detail page yields null text, which the corpus gate
    *     routes to quarantine for a later re-scrape — exactly the
    *     watcher's retry-on-improve behavior),
    *  3. runs the same fingerprint/delta/publish/quarantine/master/
    *     xlsx tick as [[start]] (P*, J1, D*, S9, S10, U1, S4/S7).
    *
    * The per-tick file-name collect is bounded by the files that landed
    * in one trigger interval — the same bounded-driver argument as any
    * file-source stream's listing. The HTTP fetch itself stays outside
    * (SURVEY §7.1): a fetcher drops pages + detail JSONL into the two
    * directories, and everything from parse to publish is this one
    * program. */
  def startHtml(spark: SparkSession, incomingHtmlDir: String,
      detailTextDir: String, masterDir: String, publishDir: String,
      quarantineDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("24 hours"),
      runDateOf: Long => String = _ => java.time.LocalDate.now().toString,
      source: String = "fda_oncology",
      baseDomain: String = "",
      minCells: Int = 3,
      masterXlsxPath: Option[String] = None,
      onTick: Tick => Unit = _ => ()): StreamingQuery = {
    // discovery stream: a file source tracks which page files are new
    // (checkpointed file index); the tick re-reads those files through
    // the DSv2 source, which owns parsing + pushdown. binaryFile with a
    // path-only projection, NOT a wholetext text source: the text
    // source materialized every page's full contents just to extract
    // input_file_name, so each page's bytes were read twice per tick
    // (round-9 advice) — binaryFile prunes `content` when only `path`
    // is selected, making discovery a pure listing pass
    val watcher = spark.readStream
      .format("binaryFile")
      // streaming file sources demand an explicit schema; this is
      // binaryFile's one fixed schema (the format rejects any other)
      .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
      .option("pathGlobFilter", "*.html")
      .load(incomingHtmlDir)
      .select(col("path").as("file"))
    watcher.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (files: DataFrame, batchId: Long) =>
        val newPages = files.select("file").distinct()
          .collect().map(_.getString(0)).sorted
        if (newPages.nonEmpty) {
          val listing = spark.read.format("graft-html")
            .option("baseDomain", baseDomain)
            .load(newPages.toIndexedSeq: _*)
            .filter(col("n_cells") >= minCells)
          // Both sides dedupe DETERMINISTICALLY before the join — the
          // detail dir is append-only (a url re-fetched across days has
          // several rows; keep the longest text, the retry-on-improve
          // winner) and one trigger window can land two listing pages
          // both carrying a row (same fingerprint key (url, title,
          // date); keep the max description). Without this the join
          // fans out and a single tick would publish duplicate rag_ids
          // into the master.
          val detail = spark.read.schema(detailSchema).json(detailTextDir)
            .filter(col("text").isNotNull)
            .groupBy("url")
            .agg(max(struct(length(col("text")).as("l"), col("text")))
              .getField("text").as("text"))
          val fresh = listing
            .groupBy("url", "title", "date")
            .agg(max(col("description")).as("description"))
            .join(detail, Seq("url"), "left")
            .select("url", "title", "description", "date", "text")
          runTick(spark, fresh, batchId, masterDir, publishDir,
            quarantineDir, runDateOf, source, masterXlsxPath, onTick)
        }
      }
      .start()
  }
}
