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
  * bounded. Cells are typed the way openpyxl types them (integral /
  * double / date-serial numeric cells, everything else inline strings);
  * the plain reader surfaces literal cell text, the schema overload
  * recovers longs/doubles/dates.
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

  /** Excel's 1900 date system epoch: serial n = days since 1899-12-30
    * (the -12-30, not -31, absorbs the inherited Lotus leap-year bug) —
    * the arithmetic openpyxl's date writer uses for any date ≥
    * 1900-03-01. */
  private[sources] val excelEpoch = java.time.LocalDate.of(1899, 12, 30)

  /** Write `df` (header = column names) as a one-sheet xlsx. Collects to
    * the driver — `maxRows` guards against pointing a corpus at an
    * interchange format (same bounded-collect contract as the IVF
    * centroid load). Cells are TYPED the way openpyxl writes them:
    * integral columns become plain numeric cells (no decimal point, no
    * float drift), double columns numeric cells, date columns numeric
    * serials (days since [[excelEpoch]]) carrying the built-in date
    * number format (numFmtId 14), everything else inline strings. Null
    * cells are written as empty strings.
    *
    * 15-digit caveat: integral values beyond 2⁵³ round-trip exactly
    * through THIS reader and through openpyxl (both parse the literal
    * digits), but Excel itself clamps numeric cells to 15 significant
    * digits on open and will corrupt such ids if a human re-saves the
    * workbook. Ids that must survive an Excel edit cycle belong in a
    * string column (the reference's master keeps its ids as text for
    * the same reason) — or set `excelSafeBigInts = true`, which writes
    * any integral with |v| > 2⁵³ as an inline STRING cell instead: an
    * Excel open/re-save cycle then cannot clamp it, and the typed
    * [[readMaster]] overload still recovers the long (string → long
    * cast parses the literal digits). Off by default because it changes
    * the cell TYPE a downstream pandas/openpyxl consumer sees for those
    * values (object dtype instead of numeric). */
  def writeMaster(df: DataFrame, path: String, maxRows: Int = 1000000,
      excelSafeBigInts: Boolean = false): Unit = {
    import org.apache.spark.sql.types._
    val cols = df.columns
    val fields = df.schema.fields
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"xlsx master write: more than $maxRows rows — use the parquet/bucketed master for corpus-sized state")
    val sheet = new StringBuilder
    sheet.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sheet.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    def strCell(ref: String, v: String): String =
      s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${esc(v)}</t></is></c>"""
    def cell(r: Int, ci: Int, value: Any, dt: DataType): String = {
      val ref = s"${colLetters(ci)}$r"
      if (value == null) strCell(ref, "")
      else dt match {
        case ByteType | ShortType | IntegerType | LongType =>
          val l = value.asInstanceOf[Number].longValue
          // |v| > 2^53: exact through this reader/openpyxl, but an Excel
          // re-save clamps to 15 significant digits — the flag routes
          // such values through an inline string cell, which Excel
          // preserves verbatim (see the writeMaster scaladoc)
          if (excelSafeBigInts && (l > (1L << 53) || l < -(1L << 53)))
            strCell(ref, l.toString) // no math.abs: abs(Long.MinValue) < 0
          else s"""<c r="$ref"><v>$l</v></c>"""
        case FloatType | DoubleType =>
          val d = value.asInstanceOf[Number].doubleValue
          if (d.isNaN || d.isInfinite) strCell(ref, d.toString)
          else s"""<c r="$ref"><v>$d</v></c>"""
        case DateType =>
          // collect() yields java.sql.Date normally but java.time
          // .LocalDate under spark.sql.datetime.java8API.enabled
          val ld = value match {
            case d: java.sql.Date => d.toLocalDate
            case d: java.time.LocalDate => d
          }
          val serial =
            java.time.temporal.ChronoUnit.DAYS.between(excelEpoch, ld)
          s"""<c r="$ref" s="1"><v>$serial</v></c>"""
        case _ => strCell(ref, value.toString)
      }
    }
    sheet.append("""<row r="1">""")
    cols.zipWithIndex.foreach { case (c, ci) =>
      sheet.append(strCell(s"${colLetters(ci)}1", c)) }
    sheet.append("</row>")
    rows.zipWithIndex.foreach { case (row, i) =>
      val r = i + 2
      sheet.append(s"""<row r="$r">""")
      cols.indices.foreach { j =>
        sheet.append(cell(r, j, row.get(j), fields(j).dataType)) }
      sheet.append("</row>")
    }
    sheet.append("</sheetData></worksheet>")

    val parts = Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/><Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/></Types>""",
      "_rels/.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""",
      "xl/workbook.xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="master" sheetId="1" r:id="rId1"/></sheets></workbook>""",
      "xl/_rels/workbook.xml.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/><Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/></Relationships>""",
      // style 0 = default, style 1 = the built-in short-date format
      // (numFmtId 14) date cells reference — what tells Excel/openpyxl
      // that a serial-number cell IS a date
      "xl/styles.xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?><styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><fonts count="1"><font/></fonts><fills count="1"><fill><patternFill patternType="none"/></fill></fills><borders count="1"><border/></borders><cellStyleXfs count="1"><xf numFmtId="0"/></cellStyleXfs><cellXfs count="2"><xf numFmtId="0" xfId="0"/><xf numFmtId="14" xfId="0" applyNumberFormat="1"/></cellXfs></styleSheet>""",
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

  /** Typed read-back: the all-string [[readMaster]] converted to
    * `schema` by column NAME — integrals/doubles parsed from the
    * numeric cell text, dates recovered from their Excel serials
    * (serial → [[excelEpoch]] + n days, openpyxl's arithmetic), blanks
    * → null. The schema plays the role openpyxl gives cell styles:
    * it is what says a numeric cell means a date. */
  def readMaster(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val raw = readMaster(spark, path)
    val converted = schema.fields.map { f =>
      val c = col(f.name)
      val nonBlank = when(c === "", lit(null)).otherwise(c)
      (f.dataType match {
        case DateType =>
          date_add(lit(java.sql.Date.valueOf("1899-12-30")),
            nonBlank.cast(IntegerType))
        case StringType => c
        case dt => nonBlank.cast(dt)
      }).as(f.name)
    }
    raw.select(converted.toIndexedSeq: _*)
  }
}
