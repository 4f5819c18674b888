package graft

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.ScheduledIngest

/** The daily-trigger daemon (scheduler.py:116-123 as Structured
  * Streaming): two trigger ticks over a landing directory must show
  * delta-only processing — a re-scraped record is a no-op on tick 2 —
  * and the manual-review quarantine split (S10). */
class ScheduledIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def rec(url: String, title: String, text: String): String =
    s"""{"url":"$url","title":"$title","description":"d","date":"01/15/2024","text":"$text"}"""

  private val longText = ("fda approves new therapy for treatment of patients " * 4).trim

  test("two ticks: delta-only processing + quarantine split") {
    val root = Files.createTempDirectory("graft_sched")
    def dir(n: String): String = { val p = root.resolve(n); Files.createDirectories(p); p.toString }
    val incoming = dir("incoming")
    val masterDir = s"$root/master"
    val publish = dir("publish")
    val quarantine = dir("quarantine")
    val checkpoint = s"$root/ckpt"

    val ticks = new java.util.concurrent.ConcurrentLinkedQueue[ScheduledIngest.Tick]()
    // tick 1 landing file: one publishable record + one too-short one
    Files.writeString(Path.of(incoming, "scrape1.json"),
      rec("https://x/1", "Drug A", longText) + "\n" +
      rec("https://x/2", "Drug B", "too short") + "\n")

    val xlsxPath = s"$root/master.xlsx"
    val q = ScheduledIngest.start(spark, incoming, masterDir, publish,
      quarantine, checkpoint,
      trigger = Trigger.ProcessingTime("500 milliseconds"),
      runDateOf = _ => "2026-01-01",
      masterXlsxPath = Some(xlsxPath),
      onTick = ticks.add(_))
    try {
      def waitTicks(n: Int): Unit = {
        val deadline = System.nanoTime() + 60L * 1000000000L
        while (ticks.size < n && System.nanoTime() < deadline) Thread.sleep(100)
        assert(ticks.size >= n, s"stream produced ${ticks.size} ticks, wanted $n")
      }
      waitTicks(1)
      val t1 = ticks.peek()
      assert(t1.nFresh == 2 && t1.nPublished == 1 && t1.nQuarantined == 1)
      assert(t1.nMaster == 1) // quarantined record NOT entered into master

      // tick 2 landing file: Drug A RE-SCRAPED (same url/title/date →
      // same fingerprint → no-op) plus one genuinely new record
      Files.writeString(Path.of(incoming, "scrape2.json"),
        rec("https://x/1", "Drug A", longText) + "\n" +
        rec("https://x/3", "Drug C", longText) + "\n")
      waitTicks(2)
      val t2 = ticks.toArray(Array.empty[ScheduledIngest.Tick]).last
      assert(t2.nFresh == 2)
      assert(t2.nPublished == 1, s"re-scrape must be a no-op: $t2")
      assert(t2.nQuarantined == 0)
      assert(t2.nMaster == 2) // Drug A + Drug C, exactly once each

      // the published stream holds each record once across both ticks
      val pub = spark.read.json(publish)
      assert(pub.count() == 2)
      assert(pub.select("title").as[String](org.apache.spark.sql.Encoders.STRING)
        .collect().toSet == Set("Drug A", "Drug C"))
      // quarantine batch 0 carries the short record for manual review
      val quar = spark.read.json(s"$quarantine/batch=0")
      assert(quar.select("title").as[String](org.apache.spark.sql.Encoders.STRING)
        .collect().toSet == Set("Drug B"))
      // the human-facing Excel master tracked the ticks (reference
      // fda_watcher.py:555) — reads back with the final master content
      val xl = graft.sources.Xlsx.readMaster(spark, xlsxPath)
      assert(xl.count() == 2)
      assert(xl.select("title").as[String](org.apache.spark.sql.Encoders.STRING)
        .collect().toSet == Set("Drug A", "Drug C"))

      // crash-window recovery: simulate a death between the swap's two
      // renames (masterDir gone, a COMPLETE .next beside it) — a fresh
      // daemon must recover the master, so a re-scrape stays a no-op
      q.stop()
      assert(new java.io.File(masterDir)
        .renameTo(new java.io.File(s"$masterDir.next")))
      Files.writeString(Path.of(incoming, "scrape3.json"),
        rec("https://x/1", "Drug A", longText) + "\n")
      val q2 = ScheduledIngest.start(spark, incoming, masterDir, publish,
        quarantine, s"$root/ckpt2_all",
        trigger = Trigger.ProcessingTime("500 milliseconds"),
        runDateOf = _ => "2026-01-02",
        onTick = ticks.add(_))
      try {
        waitTicks(3)
        val t3 = ticks.toArray(Array.empty[ScheduledIngest.Tick]).last
        // fresh checkpoint re-reads ALL landing files (3 records of which
        // 1 is the quarantine-eligible short one); the recovered master
        // makes every previously-published record a no-op
        assert(t3.nPublished == 0, s"master not recovered: $t3")
        assert(t3.nMaster == 2)
      } finally q2.stop()
    } finally {
      q.stop()
      scala.reflect.io.Directory(root.toFile).deleteRecursively()
    }
  }

  test("startHtml: DSv2-fronted lifecycle — parse new pages, detail join, " +
      "publish + quarantine + xlsx master per tick, delta on tick 2") {
    val root = Files.createTempDirectory("graft_sched_html")
    def dir(n: String): String = { val p = root.resolve(n); Files.createDirectories(p); p.toString }
    val pages = dir("pages")
    val details = dir("details")
    val masterDir = s"$root/master"
    val publish = dir("publish")
    val quarantine = dir("quarantine")
    val xlsxPath = s"$root/master.xlsx"

    def page(rows: (String, String, String)*): String =
      "<html><body><table>" +
        "<tr><th>Title</th><th>Desc</th><th>Date</th></tr>" +
        rows.map { case (href, title, date) =>
          s"""<tr><td><a href="$href">$title</a></td><td>d</td><td>$date</td></tr>"""
        }.mkString +
        "</table></body></html>"

    // detail text fetched for Drug A only — Drug B's missing detail page
    // must rout its row to quarantine (null text fails the corpus gate)
    Files.writeString(Path.of(details, "fetched1.json"),
      s"""{"url":"https://www.fda.gov/node/1","text":"$longText"}""" + "\n")
    Files.writeString(Path.of(pages, "listing1.html"),
      page(("/node/1", "Drug A", "01/15/2024"), ("/node/2", "Drug B", "01/16/2024")))

    val ticks = new java.util.concurrent.ConcurrentLinkedQueue[ScheduledIngest.Tick]()
    val q = ScheduledIngest.startHtml(spark, pages, details, masterDir,
      publish, quarantine, s"$root/ckpt",
      trigger = Trigger.ProcessingTime("500 milliseconds"),
      runDateOf = _ => "2026-01-01",
      baseDomain = "https://www.fda.gov/",
      masterXlsxPath = Some(xlsxPath),
      onTick = ticks.add(_))
    try {
      def waitTicks(n: Int): Unit = {
        val deadline = System.nanoTime() + 60L * 1000000000L
        while (ticks.size < n && System.nanoTime() < deadline) Thread.sleep(100)
        assert(ticks.size >= n, s"stream produced ${ticks.size} ticks, wanted $n")
      }
      waitTicks(1)
      val t1 = ticks.peek()
      assert(t1.nFresh == 2 && t1.nPublished == 1 && t1.nQuarantined == 1)
      assert(t1.nMaster == 1)
      val quar = spark.read.json(quarantine)
      assert(quar.select("title").as[String](org.apache.spark.sql.Encoders.STRING)
        .collect().toSet == Set("Drug B"))

      // tick 2: a new listing page re-lists Drug A (same url/title/date →
      // fingerprint no-op) and adds Drug C, whose detail text has been
      // fetched meanwhile — TWICE (append-only re-fetch), and a second
      // page in the SAME trigger window lists Drug C again: neither
      // duplication may fan out into duplicate published/master rows
      Files.writeString(Path.of(details, "fetched2.json"),
        s"""{"url":"https://www.fda.gov/node/3","text":"$longText"}""" + "\n" +
        s"""{"url":"https://www.fda.gov/node/3","text":"$longText extra"}""" + "\n")
      Files.writeString(Path.of(pages, "listing2.html"),
        page(("/node/1", "Drug A", "01/15/2024"), ("/node/3", "Drug C", "01/17/2024")))
      Files.writeString(Path.of(pages, "listing2b.html"),
        page(("/node/3", "Drug C", "01/17/2024")))
      waitTicks(2)
      val t2 = ticks.toArray(Array.empty[ScheduledIngest.Tick]).last
      assert(t2.nFresh == 2)
      assert(t2.nPublished == 1, s"re-listed row must be a no-op: $t2")
      assert(t2.nMaster == 2)

      val pub = spark.read.json(publish)
      assert(pub.select("title").as[String](org.apache.spark.sql.Encoders.STRING)
        .collect().toSet == Set("Drug A", "Drug C"))
      val xl = graft.sources.Xlsx.readMaster(spark, xlsxPath)
      assert(xl.select("title").as[String](org.apache.spark.sql.Encoders.STRING)
        .collect().toSet == Set("Drug A", "Drug C"))
    } finally {
      q.stop()
      scala.reflect.io.Directory(root.toFile).deleteRecursively()
    }
  }
}
