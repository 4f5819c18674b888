package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.Xlsx

/** S4/S7 — the master interchange file as a REAL .xlsx round-trip
  * (fda_watcher.py:388/:555), dependency-free OOXML. */
class XlsxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("master round-trips through a real xlsx file") {
    val path = java.nio.file.Files.createTempFile("graft_master", ".xlsx").toString
    val master = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(md5(concat_ws("_", $"source", $"doc_id")).as("rag_id"),
        $"source", $"lang", $"n_chars".cast("string").as("n_chars"))
      .limit(50)
    Xlsx.writeMaster(master, path)
    val back = Xlsx.readMaster(spark, path)
    assert(back.columns.toList == List("rag_id", "source", "lang", "n_chars"))
    assert(back.count() == 50)
    assert(back.collect().map(_.toSeq).toSet == master.collect().map(_.toSeq).toSet)
    new java.io.File(path).delete()
  }

  test("xlsx escaping: XML-special chars, whitespace, unicode, nulls survive") {
    val path = java.nio.file.Files.createTempFile("graft_esc", ".xlsx").toString
    val df = Seq(
      ("a&b", "<tag> \"quoted\" 'single'"),
      ("tab\there", "line\nbreak kept"),
      ("cr\rkept", "crlf\r\nkept"),
      ("naïve — π≈3.14159", ""),
      (null: String, "after-null")).toDF("k", "v")
    Xlsx.writeMaster(df, path)
    val back = Xlsx.readMaster(spark, path).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(back == Set(
      ("a&b", "<tag> \"quoted\" 'single'"),
      ("tab\there", "line\nbreak kept"),
      // &#13; escaping survives XML end-of-line normalization
      ("cr\rkept", "crlf\r\nkept"),
      ("naïve — π≈3.14159", ""),
      ("", "after-null"))) // null writes as empty cell
    new java.io.File(path).delete()
  }

  test("reads shared-string and numeric cells other producers emit") {
    // hand-built minimal xlsx the way pandas/openpyxl shape it: shared
    // strings + plain numeric <v> cells + a sparse row (blank cell B3)
    val path = java.nio.file.Files.createTempFile("graft_ext", ".xlsx").toString
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    def put(n: String, c: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(n)); zos.write(c.getBytes("UTF-8")); zos.closeEntry()
    }
    put("xl/sharedStrings.xml",
      """<sst><si><t>title</t></si><si><t>count</t></si><si><t>Drug A</t></si></sst>""")
    put("xl/worksheets/sheet1.xml",
      """<worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>42</v></c></row>
        |<row r="3"><c r="B3"><v>7</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
    val back = Xlsx.readMaster(spark, path).collect()
    assert(back.map(_.toSeq).toSet == Set(Seq("Drug A", "42"), Seq("", "7")))
    new java.io.File(path).delete()
  }

  test("corpus-sized frames are rejected, pointing at the parquet master") {
    val df = spark.range(20).select($"id".cast("string").as("k"))
    val path = java.nio.file.Files.createTempFile("graft_cap", ".xlsx").toString
    val e = intercept[IllegalArgumentException] {
      Xlsx.writeMaster(df, path, maxRows = 10)
    }
    assert(e.getMessage.contains("bucketed master"))
    new java.io.File(path).delete()
  }

  test("typed cells: long/double/date round-trip; date serials match " +
      "openpyxl's 1900-system arithmetic") {
    import org.apache.spark.sql.types._
    val rows = Seq(
      (1L, 2.5, java.sql.Date.valueOf("2024-01-15"), "a"),
      (9007199254740993L, 0.1, java.sql.Date.valueOf("1900-03-01"), "b"),
      (-42L, -1.0e-9, java.sql.Date.valueOf("2026-08-14"), "c"))
    val df = rows.toDF("id", "score", "d", "name")
    val path = java.nio.file.Files.createTempFile("graft_typed", ".xlsx").toString
    Xlsx.writeMaster(df, path)

    // raw read shows what a foreign reader sees: integers with NO
    // decimal point (no float drift even past 2^53), dates as their
    // Excel serial — 2024-01-15 is serial 45306 in the 1900 system
    // (openpyxl date→serial for any date ≥ 1900-03-01)
    val raw = Xlsx.readMaster(spark, path).collect()
      .map(r => (r.getString(0), r.getString(2))).toMap
    assert(raw("1") == "45306")
    assert(raw("9007199254740993") == "61")       // 1900-03-01
    assert(raw.contains("-42"))

    // schema read recovers the exact typed values
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("score", DoubleType), StructField("d", DateType),
      StructField("name", StringType)))
    val back = Xlsx.readMaster(spark, path, schema).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDate(2), r.getString(3)))
      .toSet
    assert(back == rows.toSet)

    // nulls in typed columns come back as nulls, not zeros
    val withNulls = Seq((Some(1L), Option.empty[java.sql.Date]),
      (Option.empty[Long], Some(java.sql.Date.valueOf("2024-01-01"))))
      .toDF("id", "d")
    Xlsx.writeMaster(withNulls, path)
    val nb = Xlsx.readMaster(spark, path, StructType(Seq(
      StructField("id", LongType), StructField("d", DateType)))).collect()
    assert(nb.exists(r => r.isNullAt(0) &&
      r.getDate(1) == java.sql.Date.valueOf("2024-01-01")))
    assert(nb.exists(r => !r.isNullAt(0) && r.getLong(0) == 1L && r.isNullAt(1)))
    new java.io.File(path).delete()
  }

  test("excelSafeBigInts: |v| > 2^53 integrals write as string cells and " +
      "still recover as longs through the typed read") {
    import org.apache.spark.sql.types._
    val big = 9007199254740993L      // 2^53 + 1: Excel would clamp it
    val edge = 9007199254740992L     // exactly 2^53: still float-exact
    val rows = Seq((big, "a"), (-big, "b"), (edge, "c"), (7L, "d"),
      (Long.MinValue, "e"))
    val df = rows.toDF("id", "name")
    val path = java.nio.file.Files.createTempFile("graft_big", ".xlsx").toString
    Xlsx.writeMaster(df, path, excelSafeBigInts = true)

    // the raw sheet XML shows the protection: big ids are inline-string
    // cells (Excel preserves those verbatim on a re-save), small/edge
    // ones stay numeric
    val zf = new java.util.zip.ZipFile(path)
    val sheetXml = try {
      val e = zf.getEntry("xl/worksheets/sheet1.xml")
      new String(zf.getInputStream(e).readAllBytes(), "UTF-8")
    } finally zf.close()
    assert(sheetXml.contains(s"<t xml:space=\"preserve\">$big</t>"))
    assert(sheetXml.contains(s"<t xml:space=\"preserve\">-$big</t>"))
    assert(sheetXml.contains(s"<t xml:space=\"preserve\">${Long.MinValue}</t>"))
    assert(sheetXml.contains(s"<v>$edge</v>"))
    assert(sheetXml.contains("<v>7</v>"))

    // typed read recovers every long exactly regardless of cell form
    val back = Xlsx.readMaster(spark, path, StructType(Seq(
        StructField("id", LongType), StructField("name", StringType))))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back == rows.toSet)

    // default (flag off) keeps the openpyxl-identical numeric cells
    Xlsx.writeMaster(df, path)
    val zf2 = new java.util.zip.ZipFile(path)
    val sheetXml2 = try {
      val e = zf2.getEntry("xl/worksheets/sheet1.xml")
      new String(zf2.getInputStream(e).readAllBytes(), "UTF-8")
    } finally zf2.close()
    assert(sheetXml2.contains(s"<v>$big</v>"))
    new java.io.File(path).delete()
  }

  test("date cells survive spark.sql.datetime.java8API.enabled " +
      "(collect yields LocalDate, not java.sql.Date)") {
    val conf = spark.conf
    val saved = conf.get("spark.sql.datetime.java8API.enabled")
    try {
      conf.set("spark.sql.datetime.java8API.enabled", "true")
      val df = Seq((1L, java.sql.Date.valueOf("2024-01-15"))).toDF("id", "d")
      val path = java.nio.file.Files.createTempFile("graft_j8", ".xlsx").toString
      Xlsx.writeMaster(df, path)
      val raw = Xlsx.readMaster(spark, path).collect()
      assert(raw.head.getString(1) == "45306")
      new java.io.File(path).delete()
    } finally conf.set("spark.sql.datetime.java8API.enabled", saved)
  }

  test("seeded fuzz: printable/whitespace content round-trips byte-identically") {
    val rnd = new scala.util.Random(11)
    // XML 1.0 cannot carry control chars < 0x20 except tab/newline/CR
    // (the writer drops them by design); everything else must survive
    // pool of whole CODE POINTS — sampling raw chars would tear the
    // emoji's surrogate pair into invalid UTF-16 that no UTF-8 format
    // can carry (the writer correctly replaces lone surrogates)
    val pool: Vector[String] =
      (' ' to '~').map(_.toString).toVector ++
        "\t\n\r äöü—π漢字".map(_.toString) :+ new String(Character.toChars(0x1F600))
    def str(): String =
      (0 until rnd.nextInt(30)).map(_ => pool(rnd.nextInt(pool.length))).mkString
    val rows = (1 to 120).map(_ => (str(), str(), str()))
    val df = spark.createDataFrame(rows).toDF("a", "b", "c")
    val path = java.nio.file.Files.createTempFile("graft_fuzz", ".xlsx").toString
    Xlsx.writeMaster(df, path)
    val back = Xlsx.readMaster(spark, path).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    // multiset equality — duplicates must be preserved
    assert(back.sorted.toSeq == rows.sorted.toSeq)
    new java.io.File(path).delete()
  }
}
