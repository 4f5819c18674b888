package graft.ops

import java.util.regex.Pattern

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S1 — the FDA listing-table source: parse the FIRST `<table>` of a page,
  * one record per `<tr>` with >= 3 `<td>` cells
  * (fda_rag_extraction/scripts/fda_watcher.py:274-355):
  *
  *  - title = cell 0 text (space-joined, trimmed), desc = cell 1,
  *    date = cell 2 (trimmed, no space-join: `get_text(strip=True)`)
  *  - href = first `<a href>` anywhere under cell 0; resolved against the
  *    base domain ([[TextOps.urlResolve]] semantics); "" when absent
  *  - rag_id = md5(url if non-empty else "title_date")  (P1/P2)
  *
  * The parse is a pure function `String => Seq[ListingRow]` so it runs as
  * a `flatMap` over fetched pages — the production shape is
  * `pages.flatMap(parseListingTable)` with one fetcher per partition
  * (rate-limited via [[graft.streaming.RateLimit]]). */
object HtmlTable {

  case class ListingRow(title: String, description: String, date: String,
      url: String)

  private val tablePat =
    Pattern.compile("(?is)<table[^>]*>(.*?)</table>")
  private val trPat = Pattern.compile("(?is)<tr[^>]*>(.*?)</tr>")
  private val tdPat = Pattern.compile("(?is)<td[^>]*>(.*?)</td>")
  private val hrefPat =
    Pattern.compile("(?is)<a\\s[^>]*href\\s*=\\s*([\"'])(.*?)\\1[^>]*>")

  private val entities = Seq("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&nbsp;" -> " ")

  private def text(inner: String, joinWithSpace: Boolean): String = {
    var s = inner.replaceAll("<[^>]*>", if (joinWithSpace) " " else "")
    entities.foreach { case (e, r) => s = s.replace(e, r) }
    s.replaceAll("\\s+", " ").trim
  }

  /** One parsed `<tr>` of the first table, BEFORE the cell-count gate:
    * `nCells` carries the actual `<td>` count so a reader can apply (or
    * push down) the >= 3 rule itself — the [[graft.sources.HtmlTableSource]]
    * scan filters on it during the parse. Missing cells read as "". */
  case class RawRow(title: String, description: String, date: String,
      url: String, nCells: Int)

  /** Every `<tr>` of the first table with at least `minCells` cells;
    * empty when no table. */
  def parseRows(html: String, baseDomain: String,
      minCells: Int): Seq[RawRow] = {
    if (html == null) return Seq.empty
    val tm = tablePat.matcher(html)
    if (!tm.find()) return Seq.empty
    val table = tm.group(1)
    val rows = Seq.newBuilder[RawRow]
    val rm = trPat.matcher(table)
    while (rm.find()) {
      val tr = rm.group(1)
      val cells = {
        val cm = tdPat.matcher(tr)
        val b = Seq.newBuilder[String]
        while (cm.find()) b += cm.group(1)
        b.result()
      }
      if (cells.length >= minCells) {
        def cell(i: Int) = if (i < cells.length) cells(i) else ""
        val title = text(cell(0), joinWithSpace = true)
        val desc = text(cell(1), joinWithSpace = true)
        val date = text(cell(2), joinWithSpace = false)
        val hm = hrefPat.matcher(cell(0))
        val url =
          if (hm.find()) {
            val raw = hm.group(2).trim
            if (raw.startsWith("http")) raw
            else if (raw.startsWith("/")) baseDomain.stripSuffix("/") + raw
            else baseDomain.stripSuffix("/") + "/" + raw
          } else ""
        rows += RawRow(title, desc, date, url, cells.length)
      }
    }
    rows.result()
  }

  /** Rows of the first table; empty when no table (fda_watcher.py:293-297). */
  def parseListingTable(html: String, baseDomain: String): Seq[ListingRow] =
    parseRows(html, baseDomain, minCells = 3)
      .map(r => ListingRow(r.title, r.description, r.date, r.url))

  /** DataFrame source shape: (page html) rows → listing records with the
    * watcher's id/timestamp columns (fda_watcher.py:331-339; `scraped_at`
    * is an injected instant per SURVEY §7.4 #5). */
  def listingSource(spark: SparkSession, pages: Seq[String],
      baseDomain: String, scrapedAt: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val parsed = pages.flatMap(parseListingTable(_, baseDomain))
    spark.createDataFrame(parsed)
      .withColumn("rag_id", md5(
        coalesce(nullif(trim(col("url")), lit("")),
          concat_ws("_", col("title"), col("date")))))
      .withColumn("scraped_at", lit(scrapedAt))
      .select(col("rag_id").as("RAG_ID"), col("title").as("Title"),
        col("url").as("Webpage"), col("description").as("Description"),
        col("date").as("Date"), lit("").as("text"),
        col("scraped_at").as("Scraped_At"))
  }
}
