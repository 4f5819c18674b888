package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Dependency-free `.xlsx` round-trip for the MASTER INTERCHANGE file —
  * the reference's Excel master (fda_watcher.py:388 read_excel, :555
  * to_excel) as an actual OOXML file, not a parquet stand-in. An .xlsx
  * is a zip of SpreadsheetML parts; writing one sheet with inline
  * strings and reading back inline/shared/plain cells needs only
  * java.util.zip + the JDK XML parser, so the offline-deps constraint
  * (no spark-excel connector) does not apply.
  *
  * Engine-role note (why this is NOT a distributed sink): xlsx is a
  * single-file, random-access format — the human/Excel-facing EDGE of
  * the pipeline, inherently driver-sized, like the reference's own
  * master. The engine's scale forms of master state remain
  * [[Sinks.writeMaster]] (parquet) and [[Sinks.writeBucketedMaster]]
  * (co-partitioned J1); `writeMaster` here COLLECTS and enforces
  * `maxRows` to make the driver-side materialization explicit and
  * bounded. All cells are strings (string-typed interchange, the CSV
  * contract); numeric cells read back as their literal text.
  */
object Xlsx {

  private def esc(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '&' => b.append("&amp;")
      case '<' => b.append("&lt;")
      case '>' => b.append("&gt;")
      case '"' => b.append("&quot;")
      case '\'' => b.append("&apos;")
      // carriage return must go out as a character REFERENCE: XML 1.0
      // end-of-line normalization rewrites a literal #xD to #xA at parse
      // time (silent \r → \n corruption); &#13; survives — the same
      // escaping Excel/openpyxl emit
      case '\r' => b.append("&#13;")
      // other literal control chars are invalid in XML 1.0 (Excel
      // rejects the file); tab/newline are legal and round-trip.
      // Unpaired surrogates (invalid UTF-16) become U+FFFD/'?' at UTF-8
      // encoding time — no UTF-8 format can carry them (XlsxSpec fuzzes
      // the valid space).
      case c if c < ' ' && c != '\t' && c != '\n' => ()
      case c => b.append(c)
    }
    b.toString
  }

  /** 0-based column index → A1-style letters (0→A, 25→Z, 26→AA). */
  private[sources] def colLetters(i: Int): String = {
    var n = i + 1
    val b = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; b.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    b.toString
  }

  /** Write `df` (header = column names) as a one-sheet xlsx. Collects to
    * the driver — `maxRows` guards against pointing a corpus at an
    * interchange format (same bounded-collect contract as the IVF
    * centroid load). Null cells are written as empty strings. */
  def writeMaster(df: DataFrame, path: String, maxRows: Int = 1000000): Unit = {
    val cols = df.columns
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"xlsx master write: more than $maxRows rows — use the parquet/bucketed master for corpus-sized state")
    val sheet = new StringBuilder
    sheet.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sheet.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    def appendRow(r: Int, vals: Seq[String]): Unit = {
      sheet.append(s"""<row r="$r">""")
      vals.zipWithIndex.foreach { case (v, ci) =>
        sheet.append(s"""<c r="${colLetters(ci)}$r" t="inlineStr"><is><t xml:space="preserve">${esc(v)}</t></is></c>""")
      }
      sheet.append("</row>")
    }
    appendRow(1, cols.toIndexedSeq)
    rows.zipWithIndex.foreach { case (row, i) =>
      appendRow(i + 2, cols.indices.map { j =>
        val v = row.get(j); if (v == null) "" else v.toString
      })
    }
    sheet.append("</sheetData></worksheet>")

    val parts = Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>""",
      "_rels/.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""",
      "xl/workbook.xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="master" sheetId="1" r:id="rId1"/></sheets></workbook>""",
      "xl/_rels/workbook.xml.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""",
      "xl/worksheets/sheet1.xml" -> sheet.toString)
    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try parts.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    } finally zos.close()
  }

  /** Read the first worksheet back as an all-string DataFrame (header
    * row = column names). Handles the three cell forms any producer
    * emits — inline strings, shared-string refs, and plain `<v>` values
    * (numbers) — so files written by Excel/pandas read too, not just our
    * own. Missing/blank cells → "". */
  def readMaster(spark: SparkSession, path: String): DataFrame = {
    val zf = new ZipFile(path)
    try {
      def read(name: String): Option[org.w3c.dom.Document] =
        Option(zf.getEntry(name)).map { e =>
          val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
          f.setNamespaceAware(false)
          // parse from the stream; entities/doctype are not legal in
          // SpreadsheetML parts, keep the parser from resolving any
          f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
          f.newDocumentBuilder().parse(zf.getInputStream(e))
        }
      val shared: IndexedSeq[String] = read("xl/sharedStrings.xml").map { d =>
        val sis = d.getElementsByTagName("si")
        (0 until sis.getLength).map(i => sis.item(i).getTextContent)
      }.getOrElse(IndexedSeq.empty)
      val sheetName = {
        val names = zf.entries()
        var best: String = null
        while (names.hasMoreElements) {
          val n = names.nextElement().getName
          if (n.startsWith("xl/worksheets/sheet") && n.endsWith(".xml") &&
              (best == null || n < best)) best = n
        }
        require(best != null, s"no worksheet part in $path")
        best
      }
      val doc = read(sheetName).get
      val rowNodes = doc.getElementsByTagName("row")
      val table = ArrayBuffer.empty[ArrayBuffer[String]]
      for (i <- 0 until rowNodes.getLength) {
        val cells = rowNodes.item(i).asInstanceOf[org.w3c.dom.Element]
          .getElementsByTagName("c")
        val out = ArrayBuffer.empty[String]
        for (j <- 0 until cells.getLength) {
          val c = cells.item(j).asInstanceOf[org.w3c.dom.Element]
          // A1-ref column index; cells may be sparse (blank cells
          // omitted). A writer may legally omit r entirely — then cells
          // are consecutive, so the next slot is the position.
          val letters = c.getAttribute("r").takeWhile(_.isLetter)
          val ci =
            if (letters.isEmpty) out.length
            else letters.foldLeft(0)((a, ch) => a * 26 + (ch - 'A' + 1)) - 1
          while (out.length < ci) out += ""
          val t = c.getAttribute("t")
          val v = t match {
            case "inlineStr" => c.getTextContent
            case "s" =>
              val idx = c.getElementsByTagName("v").item(0).getTextContent.trim.toInt
              shared(idx)
            case _ =>
              val vn = c.getElementsByTagName("v")
              if (vn.getLength == 0) "" else vn.item(0).getTextContent
          }
          out += v
        }
        table += out
      }
      require(table.nonEmpty, s"empty worksheet in $path")
      val header = table.head
      val width = header.length
      val schema = StructType(header.map(h => StructField(h, StringType)).toIndexedSeq)
      val data = table.drop(1).map { r =>
        Row.fromSeq((0 until width).map(j => if (j < r.length) r(j) else ""))
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(data.toSeq, 1), schema)
    } finally zf.close()
  }
}
