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
      .start()
  }
}
