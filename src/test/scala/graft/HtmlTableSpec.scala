package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.HtmlTable

/** S1 listing-table parse semantics (fda_watcher.py:274-355, FIXTURES B1). */
class HtmlTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val page =
    """<html><body>
      |<table>
      |<tr><th>Title</th><th>Desc</th><th>Date</th></tr>
      |<tr><td><a href="/node/123">Drug <b>A</b> approved</a></td>
      |    <td>For &amp; treatment</td><td> 01/15/2024 </td></tr>
      |<tr><td><span><a href="https://other.org/x">Drug B</a></span></td>
      |    <td>desc B</td><td>01/16/2024</td></tr>
      |<tr><td>No link drug</td><td>desc C</td><td>01/17/2024</td></tr>
      |<tr><td>only</td><td>two cells</td></tr>
      |</table>
      |<table><tr><td>second</td><td>table</td><td>ignored</td></tr></table>
      |</body></html>""".stripMargin

  test("one row per tr with >=3 td; first table only; header tr skipped") {
    val rows = HtmlTable.parseListingTable(page, "https://www.fda.gov/")
    assert(rows.length == 3)
    assert(rows(0).title == "Drug A approved")
    assert(rows(0).description == "For & treatment")
    assert(rows(0).date == "01/15/2024")
    assert(rows(0).url == "https://www.fda.gov/node/123")
    assert(rows(1).url == "https://other.org/x")   // absolute passes through
    assert(rows(2).url == "")                       // no link → empty
  }

  test("no table → empty; null html → empty") {
    assert(HtmlTable.parseListingTable("<body>nothing</body>", "b").isEmpty)
    assert(HtmlTable.parseListingTable(null, "b").isEmpty)
  }

  test("listingSource builds the watcher schema with P1/P2 fingerprints") {
    val df = HtmlTable.listingSource(spark, Seq(page),
      "https://www.fda.gov/", scrapedAt = "2026-08-12 09:00:00")
    val rows = df.collect()
    assert(df.columns.toList == List("RAG_ID", "Title", "Webpage",
      "Description", "Date", "text", "Scraped_At"))
    assert(rows.length == 3)
    // url-less row falls back to md5("title_date") (fda_watcher.py:328)
    val noLink = rows.find(_.getAs[String]("Title") == "No link drug").get
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("No link drug_01/17/2024".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(noLink.getAs[String]("RAG_ID") == expected)
  }

  test("DSv2 source round-trips the fixture page via spark.read.format") {
    val dir = java.nio.file.Files.createTempDirectory("graft_html_src")
    java.nio.file.Files.writeString(dir.resolve("page1.html"), page)
    java.nio.file.Files.writeString(dir.resolve("ignore.txt"), "not html")
    try {
      import org.apache.spark.sql.functions.col
      val df = spark.read.format("graft-html")
        .option("baseDomain", "https://www.fda.gov/")
        .load(dir.toString)
        .filter(col("n_cells") >= 3)
      val rows = df.orderBy("date").collect()
      val parsed = HtmlTable.parseListingTable(page, "https://www.fda.gov/")
      assert(rows.length == parsed.length)
      rows.zip(parsed).foreach { case (r, p) =>
        assert(r.getAs[String]("title") == p.title)
        assert(r.getAs[String]("description") == p.description)
        assert(r.getAs[String]("date") == p.date)
        assert(r.getAs[String]("url") == p.url)
        assert(r.getAs[Int]("n_cells") >= 3)
      }
    } finally {
      dir.toFile.listFiles.foreach(_.delete()); dir.toFile.delete()
    }
  }

  test("DSv2 source pushes the cell-count gate into the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_html_push")
    java.nio.file.Files.writeString(dir.resolve("p.html"), page)
    try {
      import org.apache.spark.sql.functions.col
      val df = spark.read.format("graft-html")
        .option("baseDomain", "b").load(dir.toString)
        .filter(col("n_cells") >= 3)
      val plan = df.queryExecution.executedPlan.toString
      // the bound reached the scan ...
      assert(plan.contains("PushedMinCells: 3"), plan)
      // ... and the Filter NODE is gone (fully handled by the source);
      // match the operator spelling, not the scan's "RuntimeFilters: []"
      assert(!plan.contains("- Filter ") && !plan.contains(") Filter "), plan)
      // un-filtered read surfaces every <tr>: the th-only header row
      // (0 td cells) and the 2-cell row — the gate is pushdown, not
      // baked into the source
      val all = spark.read.format("graft-html")
        .option("baseDomain", "b").load(dir.toString).collect()
      assert(all.exists(_.getAs[Int]("n_cells") == 2))
      assert(all.exists(_.getAs[Int]("n_cells") == 0))
      assert(all.length == 5)
    } finally {
      dir.toFile.listFiles.foreach(_.delete()); dir.toFile.delete()
    }
  }
}
