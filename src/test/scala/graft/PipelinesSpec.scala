package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

import graft.pipeline.{FdaPipeline, PdfPipeline, JsonlPublish}
import graft.sources.{Sources, Sinks}

/** End-to-end lifecycle tests (SURVEY §3.1–§3.3) on synthetic fixtures. */
class PipelinesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_e2e").toString

  test("FDA lifecycle: delta → clean → publish → master update") {
    val fresh = Seq(
      ("https://x/1", "Drug A approval", "desc A", "01/01/2024",
        "FDA approves drug A for treatment.\nFollow the Oncology Center of Excellence on X now.\nUseful body long enough to pass the fifty character substance gate."),
      ("https://x/2", "Drug B approval", "desc B", "01/02/2024",
        "short"), // dropped by the >50 gate
      ("https://x/3", "Drug C approval", "desc C", "01/03/2024",
        "Existing doc that is already in the master table, with plenty of text to pass the gate.")
    ).toDF("url", "title", "description", "date", "text")

    // master already contains url 3's fingerprint
    val master = Seq(Tuple1("https://x/3")).toDF("url")
      .select(md5(col("url")).as("rag_id"), col("url"))

    val r = FdaPipeline.run(fresh, master, runDate = "2026-01-01")
    val published = r.published.collect()
    assert(published.length == 1)
    val row = published(0)
    assert(row.getAs[String]("url") == "https://x/1")
    assert(!row.getAs[String]("content").contains("Follow the Oncology Center"))
    assert(row.getAs[String]("source") == "fda_oncology")
    assert(row.getAs[String]("version") == "1.0")
    // master grew by exactly the published delta
    assert(r.updatedMaster.count() == 2)
  }

  test("PDF lifecycle: convert → doi/title enrich → verify → output") {
    val mk = (s: String) => s.getBytes("UTF-8")
    val binaries = Seq(
      ("f1.pdf", mk("# Paper One\n\nBody text doi: 10.1234/jex.2023.001 rest.")),
      ("f2.pdf", mk("# A Study of Examplinib In Mice\n\nNo doi present here.")),
      ("f3.pdf", mk("# Completely Unrelated\n\nNothing matches this one.")),
      // DOI conflict: title matches dim row 1 exactly, but the local DOI
      // differs from that row's DOI → verify() vetoes (pubmed_enrichment
      // .py:277-284 returns unverified before the title check is reached)
      ("f4.pdf", mk("# Paper One Exact\n\nBody doi: 10.9999/conflict.404 x."))
    ).toDF("path", "content")

    val dim = Seq(
      ("10.1234/jex.2023.001", "Paper One Exact", "J One", "2023",
        Seq("Smith, J"), "111"),
      (null, "A Study of Examplinib in Mice", "J Two", "2022",
        Seq("Doe, A", "Roe, B"), "222")
    ).toDF("doi", "title", "journal", "year", "authors", "pmid")

    val out = PdfPipeline.run(binaries, dim).collect()
      .map(r => r.getAs[String]("path") -> r).toMap

    assert(out("f1.pdf").getAs[Boolean]("verified"))
    assert(out("f1.pdf").getAs[String]("Link") == "https://doi.org/10.1234/jex.2023.001")
    assert(out("f1.pdf").getAs[String]("Citation").contains("(2023)"))

    assert(out("f2.pdf").getAs[Boolean]("verified"))   // title sim ≥ 0.90
    assert(out("f2.pdf").getAs[String]("Link") == "https://pubmed.ncbi.nlm.nih.gov/222")
    assert(out("f2.pdf").getAs[String]("Citation").startsWith("Doe, A, & Roe, B."))

    assert(!out("f4.pdf").getAs[Boolean]("verified"))  // DOI-conflict veto
    assert(out("f4.pdf").getAs[String]("Citation") ==
      "Document. Paper One Exact. (Unverified)")

    assert(!out("f3.pdf").getAs[Boolean]("verified"))
    assert(out("f3.pdf").getAs[String]("Citation") ==
      "Document. Completely Unrelated. (Unverified)")
    assert(out("f3.pdf").getAs[String]("Link") == "https://pubmed.ncbi.nlm.nih.gov")
  }

  test("JSONL publish lifecycle over a real directory tree") {
    val in = tmp()
    val fdaDir = new java.io.File(s"$in/fda_set"); fdaDir.mkdirs()
    Files.writeString(java.nio.file.Path.of(s"$in/fda_set/a.json"),
      """[{"RAG_ID":"r1","Title":"T1","Webpage":"https://x/1","Date":"2024-01-01",
        |"Corpus":"markdown='Hello ![img](u) world\\nnext'"}]""".stripMargin)
    val otherDir = new java.io.File(s"$in/other_set"); otherDir.mkdirs()
    Files.writeString(java.nio.file.Path.of(s"$in/other_set/b.json"),
      """{"content":"Plain content body","title":"T2","url":"https://x/2"}""")

    val out = tmp() + "/out"
    val stats = JsonlPublish.run(spark, Seq(s"$in/fda_set", s"$in/other_set"),
      out, runDate = "2026-01-01").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats("fda_oncology") == 1L)
    assert(stats("other_set") == 1L)

    val written = spark.read.json(out)
    assert(written.count() == 2)
    val fda = written.filter(col("rag_id") === "r1").collect()(0)
    assert(fda.getAs[String]("content") == "Hello  world\nnext")
    assert(fda.getAs[String]("date") == "2024-01-01")
  }

  test("quarantine split routes rows to ok/failed sinks") {
    val df = Seq((1, true), (2, false), (3, true)).toDF("id", "ok")
    val base = tmp()
    val (nOk, nBad) = Sinks.quarantineSplit(df, col("ok"),
      s"$base/ok", s"$base/failed")
    assert(nOk == 2 && nBad == 1)
    assert(spark.read.json(s"$base/ok").count() == 2)
    assert(spark.read.json(s"$base/failed").count() == 1)
  }

  test("recursive json source retains file identity and sorts deterministically") {
    val in = tmp()
    new java.io.File(s"$in/sub").mkdirs()
    Files.writeString(java.nio.file.Path.of(s"$in/z.json"), """{"v":1}""")
    Files.writeString(java.nio.file.Path.of(s"$in/sub/a.json"), """{"v":2}""")
    val df = Sources.jsonDirRecursive(spark, in)
    assert(df.count() == 2)
    val files = df.select("src_file").as[String].collect()
    assert(files.forall(_.endsWith(".json")))
  }
}
