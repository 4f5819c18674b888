package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart, SparkListenerJobEnd}
import org.apache.spark.sql.SparkSession

/** Stage-level decomposition probe for the graph fixed-point variance
  * (r13 verdict wrong-item #3: graph_pagerank fresh-JVM sf10 samples
  * spread 86–231 s with nothing stage-level saying WHERE the extra time
  * goes — GC, checkpoint I/O, a lost partitioning regime, or
  * block-manager eviction all fit the symptom from outside).
  *
  * Runs ONE query (default graph_pagerank) under the exact Bench session
  * config + warmup, with a SparkListener recording per-stage wall time,
  * executor run time, JVM GC time, shuffle read/write bytes, memory/disk
  * spill, and task count, plus per-job boundaries. Prints one JSON line:
  *
  *   {"query":…, "sec":…, "stages":[{id,name,wall_ms,run_ms,gc_ms,
  *     shuffle_read_mb,shuffle_write_mb,spill_mem_mb,spill_disk_mb,
  *     tasks}…], "n_jobs":…, "gc_ms_total":…, "run_ms_total":…,
  *     "wall_ms_total":…, "gap_ms":…(wall between jobs — scheduler +
  *     driver + eager-checkpoint setup time not inside any stage),
  *     "process_gc_ms":…(driver-JVM collector total — local mode runs
  *     executors in-process, so this is THE GC number)}
  *
  * The discriminating signals: a regime flip shows as a different stage
  * COUNT/shape; GC pressure as gc_ms ≫ between runs at equal stage
  * shape; eviction/recompute as extra stages re-running the same names
  * with extra shuffle read; checkpoint I/O as gap_ms growth.
  *
  * Usage:  SPARK_GRAFT_SF_DIR=… sbt "runMain graft.PageRankProbe [query]"
  */
object PageRankProbe {
  case class StageRow(id: Int, attempt: Int, name: String, wallMs: Long,
      runMs: Long, gcMs: Long, shufReadMb: Double, shufWriteMb: Double,
      spillMemMb: Double, spillDiskMb: Double, tasks: Int)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val query = args.headOption.getOrElse("graph_pagerank")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Bench-identical warmup (codegen/JIT/page-cache parity with the
    // spot-bench numbers this probe explains).
    SparkEntry.queries.get("q1_agg").foreach { fn =>
      try fn(spark, sfDir).count() catch { case _: Throwable => }
    }
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { tbl =>
      try spark.read.parquet(s"$sfDir/$tbl.parquet").count()
      catch { case _: Throwable => }
    }
    try {
      import spark.implicits._
      graft.ops.Components.connectedComponents(
        Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("i", "j")).count()
    } catch { case _: Throwable => }

    val stages = new mutable.ArrayBuffer[StageRow]()
    val jobSpans = new mutable.ArrayBuffer[(Int, Long, Long)]()
    val jobStarts = new mutable.HashMap[Int, Long]()
    val listener = new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val si = ev.stageInfo
        val m = si.taskMetrics
        val wall = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(-1L)
        stages.synchronized {
          stages += StageRow(si.stageId, si.attemptNumber(), si.name,
            wall, m.executorRunTime, m.jvmGCTime,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            m.memoryBytesSpilled / 1e6, m.diskBytesSpilled / 1e6,
            si.numTasks)
        }
      }
      override def onJobStart(ev: SparkListenerJobStart): Unit =
        jobStarts.synchronized { jobStarts(ev.jobId) = ev.time }
      override def onJobEnd(ev: SparkListenerJobEnd): Unit =
        jobStarts.synchronized {
          jobStarts.remove(ev.jobId).foreach(t0 =>
            jobSpans += ((ev.jobId, t0, ev.time)))
        }
    }
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def processGcMs(): Long = {
      var s = 0L; gcBeans.forEach(b => s += math.max(0L, b.getCollectionTime)); s
    }

    spark.sparkContext.addSparkListener(listener)
    val gc0 = processGcMs()
    val t0 = System.nanoTime()
    SparkEntry.queries(query)(spark, sfDir).count()
    val sec = (System.nanoTime() - t0) / 1e9
    val gcProc = processGcMs() - gc0
    // listener bus drains asynchronously; poll until stage AND job
    // counts have been stable for a quiet period with no job still open
    // (stage-count-only stability dropped a trailing JobEnd arriving
    // after the window, skewing job_ms/gap_ms/n_jobs — r14 advisory)
    val deadline = System.nanoTime() + 15e9.toLong
    var last = (-1, -1, false)
    var lastChange = System.nanoTime()
    while (System.nanoTime() < deadline &&
        System.nanoTime() - lastChange < 500e6.toLong) {
      Thread.sleep(50)
      val now = (stages.synchronized(stages.size),
        jobStarts.synchronized(jobSpans.size),
        jobStarts.synchronized(jobStarts.isEmpty))
      if (now != last || !now._3) { last = now; lastChange = System.nanoTime() }
    }
    spark.sparkContext.removeSparkListener(listener)

    val rows = stages.toSeq.sortBy(s => (s.id, s.attempt))
    def j(s: String): String = "\"" + s.replace("\\", "\\\\")
      .replace("\"", "\\\"") + "\""
    val stageJson = rows.map { s =>
      s"""{"id":${s.id},"attempt":${s.attempt},"name":${j(s.name)},""" +
        s""""wall_ms":${s.wallMs},"run_ms":${s.runMs},"gc_ms":${s.gcMs},""" +
        f""""shuffle_read_mb":${s.shufReadMb}%.1f,"shuffle_write_mb":${s.shufWriteMb}%.1f,""" +
        f""""spill_mem_mb":${s.spillMemMb}%.1f,"spill_disk_mb":${s.spillDiskMb}%.1f,""" +
        s""""tasks":${s.tasks}}"""
    }.mkString("[", ",", "]")
    val spans = jobSpans.toSeq.sortBy(_._1)
    val jobMs = spans.map { case (_, a, b) => b - a }.sum
    // wall not inside ANY job, via the merged union of job intervals
    // (sweep-line): AQE/broadcast-exchange jobs overlap, so the raw sum
    // can exceed wall and max(0, wall − sum) silently read gap_ms=0 —
    // the 'checkpoint I/O shows as gap growth' discriminator needs the
    // union (r14 advisory). Both numbers ship: job_ms (raw sum, the
    // overlap measure) and job_union_ms (coverage).
    val jobUnionMs = {
      var covered = 0L
      var end = Long.MinValue
      spans.map { case (_, a, b) => (a, b) }.sortBy(_._1).foreach {
        case (a, b) =>
          if (a > end) { covered += math.max(0L, b - a); end = b }
          else if (b > end) { covered += b - end; end = b }
      }
      covered
    }
    val spanStart = spans.map(_._2).minOption.getOrElse(0L)
    val spanEnd = spans.map(_._3).maxOption.getOrElse(0L)
    val gapMs = math.max(0L, (sec * 1000).toLong - jobUnionMs)
    println(
      s"""{"query":${j(query)},"sec":${f"$sec%.2f"},"n_stages":${rows.size},""" +
      s""""n_jobs":${spans.size},"wall_ms_total":${rows.map(_.wallMs).sum},""" +
      s""""run_ms_total":${rows.map(_.runMs).sum},"gc_ms_total":${rows.map(_.gcMs).sum},""" +
      s""""process_gc_ms":$gcProc,"job_ms":$jobMs,"job_union_ms":$jobUnionMs,"gap_ms":$gapMs,""" +
      s""""job_window_ms":${spanEnd - spanStart},""" +
      f""""shuffle_read_mb":${rows.map(_.shufReadMb).sum}%.1f,""" +
      f""""shuffle_write_mb":${rows.map(_.shufWriteMb).sum}%.1f,""" +
      f""""spill_disk_mb":${rows.map(_.spillDiskMb).sum}%.1f,""" +
      s""""stages":$stageJson}""")
    spark.stop()
  }
}
