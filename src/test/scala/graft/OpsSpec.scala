package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{TextOps, Enrich, Fingerprint}
import graft.expr.{functions => gf}

/** Column-op behavior through the real Spark engine (local[4]) — exercises
  * codegen paths of both the built-in compositions and the custom
  * expressions. */
class OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(colExpr: org.apache.spark.sql.Column, input: String): String =
    Seq(input).toDF("c").select(colExpr.as("r")).collect()(0).getString(0)

  test("formatAuthors: 0/1/2/3/4 authors (pubmed_enrichment.py:235-244)") {
    val df = Seq(
      (0, Seq.empty[String]),
      (1, Seq("Smith J")),
      (2, Seq("Smith J", "Doe A")),
      (3, Seq("Smith J", "Doe A", "Roe B")),
      (4, Seq("Smith J", "Doe A", "Roe B", "Poe C"))
    ).toDF("n", "authors")
    val got = df.select($"n", Enrich.formatAuthors($"authors").as("f"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got(0) == "Unknown")
    assert(got(1) == "Smith J")
    assert(got(2) == "Smith J, & Doe A")
    assert(got(3) == "Smith J, Doe A, & Roe B")
    assert(got(4) == "Smith J et al.")
  }

  test("buildCitation with and without DOI") {
    val df = Seq(("A et al.", "2024", "T", "J", "10.1/x"),
      ("A et al.", "2024", "T", "J", null)).toDF("a", "y", "t", "j", "d")
    val got = df.select(Enrich.buildCitation($"a", $"y", $"t", $"j", $"d").as("c"))
      .collect().map(_.getString(0))
    assert(got(0) == "A et al.. (2024). T. J. https://doi.org/10.1/x")
    assert(got(1) == "A et al.. (2024). T. J")
  }

  test("buildLink prefers DOI") {
    val df = Seq(("10.1/x", "123"), (null, "456")).toDF("d", "p")
    val got = df.select(Enrich.buildLink($"d", $"p").as("l")).collect().map(_.getString(0))
    assert(got(0) == "https://doi.org/10.1/x")
    assert(got(1) == "https://pubmed.ncbi.nlm.nih.gov/456")
  }

  test("stripMarkerWrapper removes wrapper only when fully wrapped") {
    assert(one(TextOps.stripMarkerWrapper($"c"), "markdown='body text'") == "body text")
    assert(one(TextOps.stripMarkerWrapper($"c"), "plain") == "plain")
  }

  test("unescapeNewlines + collapseWhitespace") {
    assert(one(TextOps.unescapeNewlines($"c"), """a\nb""") == "a\nb")
    assert(one(TextOps.collapseWhitespace($"c"), "a   b\n\n\n\nc") == "a b\n\nc")
  }

  test("normalizeForCompare keeps reference's trailing-space quirk") {
    assert(one(TextOps.normalizeForCompare($"c"), "Hello, World!") == "hello world ")
  }

  test("normalizeDoi strips prefixes") {
    assert(one(TextOps.normalizeDoi($"c"), "https://doi.org/10.1/X") == "10.1/x")
    assert(one(TextOps.normalizeDoi($"c"), "DOI: 10.2/y") == "10.2/y")
    assert(one(TextOps.normalizeDoi($"c"), " 10.3/z ") == "10.3/z")
  }

  test("custom expressions work via SQL registration (similarity/clean_corpus/extract_doi)") {
    gf.registerAll(spark)
    val r = spark.sql(
      "SELECT similarity('kitten','sitting') s, clean_corpus('a  b') c, extract_doi('x 10.1234/ok y') d")
      .collect()(0)
    assert(math.abs(r.getDouble(0) - 8.0 / 13) < 1e-12)
    assert(r.getString(1) == "a b")
    assert(r.getString(2) == "10.1234/ok")
  }

  test("similarity expression survives codegen on a real column scan") {
    val df = Seq(("abc", "abc"), ("abc", "abd"), (null, "x")).toDF("a", "b")
    val got = df.select(gf.similarity($"a", $"b").as("s")).collect()
    assert(got(0).getDouble(0) == 1.0)
    assert(got(1).getDouble(0) > 0.5 && got(1).getDouble(0) < 1.0)
    assert(got(2).isNullAt(0))
  }

  test("dedupByFingerprint is idempotent and keeps min tie-break") {
    val df = Seq(("k1", 5L, "a"), ("k1", 2L, "b"), ("k2", 9L, "c"))
      .toDF("rag_id", "doc_id", "source")
    val d1 = Fingerprint.dedupByFingerprint(df, "rag_id", "doc_id")
    val rows = d1.orderBy($"rag_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "k1" && rows(0).getLong(1) == 2L && rows(0).getString(2) == "b")
    val d2 = Fingerprint.dedupByFingerprint(d1, "rag_id", "doc_id")
    assert(d2.collect().toSet == d1.collect().toSet)
  }

  test("deltaAntiJoin ∪ master covers all; delta ∩ master = ∅") {
    val all = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("rag_id", "v")
    val master = Seq(("a", 0)).toDF("rag_id", "v")
    val delta = Fingerprint.deltaAntiJoin(all, master, "rag_id")
    val ids = delta.select("rag_id").as[String].collect().toSet
    assert(ids == Set("b", "c"))
  }

  test("deltaAntiJoinBloom == deltaAntiJoin, even under a saturated filter") {
    val all = (1 to 500).map(i => (s"id$i", i)).toDF("rag_id", "v")
    val master = (1 to 500).filter(_ % 3 == 0).map(i => (s"id$i", i))
      .toDF("rag_id", "v")
    val exact = Fingerprint.deltaAntiJoin(all, master, "rag_id")
      .as[(String, Int)].collect().toSet
    // healthy filter
    val bloom = Fingerprint.deltaAntiJoinBloom(all, master, "rag_id",
      expectedItems = 1000L).as[(String, Int)].collect().toSet
    assert(bloom == exact)
    // deliberately undersized, high-FPP filter: false positives merely
    // route rows to the exact residual join — the result cannot change
    val saturated = Fingerprint.deltaAntiJoinBloom(all, master, "rag_id",
      expectedItems = 5L, fpp = 0.5).as[(String, Int)].collect().toSet
    assert(saturated == exact)
  }

  test("snapshotDiff classifies added/removed/changed; unchanged drops out") {
    val old_ = Seq((1L, "same"), (2L, "was"), (3L, "gone")).toDF("k", "p")
    val new_ = Seq((1L, "same"), (2L, "now"), (4L, "fresh")).toDF("k", "p")
    val got = graft.ops.Incremental.snapshotDiff(old_, new_, "k", "p")
      .as[(Long, String)].collect().toSet
    assert(got == Set((2L, "changed"), (3L, "removed"), (4L, "added")))
  }

  test("refreshCountSum merged state equals a full recompute") {
    val raw = (1 to 100).map(i => (s"k${i % 3}", i.toDouble)).toDF("k", "v")
    val base = raw.filter($"v" <= 70).groupBy("k")
      .agg(count(lit(1)).as("n"), sum($"v".cast("decimal(18,2)")).as("s"))
    val delta = raw.filter($"v" > 70)
    val merged = graft.ops.Incremental.refreshCountSum(base, delta,
      Seq("k"), "n", "s", "v")
      .select($"k", $"n", $"s".cast("string"))
      .as[(String, Long, String)].collect().toSet
    val full = raw.groupBy("k")
      .agg(count(lit(1)).as("n"), sum($"v".cast("decimal(18,2)")).as("s"))
      .select($"k", $"n", $"s".cast("string"))
      .as[(String, Long, String)].collect().toSet
    assert(merged == full)
  }

  test("nfc_normalize composes decomposed sequences; idempotent on composed") {
    val decomposed = "e" + '́' // e + combining acute
    val composed = "é"         // é
    val df = Seq((1L, decomposed), (2L, composed), (3L, "plain"))
      .toDF("id", "s")
      .select($"id", graft.expr.functions.nfc_normalize($"s").as("n"))
    val got = df.orderBy("id").as[(Long, String)].collect().map(_._2)
    assert(got(0) == composed)
    assert(got(1) == composed) // idempotent
    assert(got(2) == "plain")
  }

  test("Tagging: reasons in rule order, null attrs fail closed, stats count drops") {
    import graft.ops.Tagging
    val base = Seq(
      (1L, Some(50), Some(40)),  // passes both
      (2L, Some(5), Some(40)),   // fails min_n
      (3L, Some(5), None),       // fails min_n AND null uniq → both reasons
      (4L, Some(50), Some(1))    // fails diversity
    ).toDF("id", "n_raw", "u_raw")
    val df = Tagging.tagAttributes(base,
      Seq("n" -> $"n_raw", "u" -> $"u_raw" * 1)).drop("n_raw", "u_raw")
    val out = Tagging.applyRules(df, Seq(
        "min_n" -> ($"n" >= 10),
        "diverse" -> ($"u" >= 20)))
      .select("id", "drop_reasons", "keep")
      .as[(Long, String, Boolean)].collect().sortBy(_._1)
    assert(out(0) == ((1L, "", true)))
    assert(out(1) == ((2L, "min_n", false)))
    assert(out(2) == ((3L, "min_n,diverse", false))) // rule order, null fails
    assert(out(3) == ((4L, "diverse", false)))
    val stats = Tagging.ruleStats(Tagging.applyRules(df, Seq(
        "min_n" -> ($"n" >= 10),
        "diverse" -> ($"u" >= 20))))
      .as[(String, Long)].collect().toMap
    assert(stats == Map("min_n" -> 2L, "diverse" -> 2L))
  }

  test("scd2Lookup resolves each probe to exactly its valid version") {
    import graft.ops.Fingerprint
    val hist = Seq(
      (1L, "v1", "2025-01-01", Option("2025-07-01")),
      (1L, "v2", "2025-07-01", None),
      (2L, "w1", "2025-01-01", None)
    ).toDF("id", "payload", "valid_from", "valid_to")
    val probes = Seq(
      (1L, "2025-03-15"),  // inside v1
      (1L, "2025-07-01"),  // boundary: valid_to exclusive → v2
      (1L, "2026-01-01"),  // open current → v2
      (2L, "2024-06-01"),  // before any version → no row
      (3L, "2025-06-01")   // unknown id → no row
    ).toDF("id", "as_of")
    val got = Fingerprint.scd2Lookup(hist, probes, "id", "as_of")
      .select("id", "as_of", "payload")
      .as[(Long, String, String)].collect().toSet
    assert(got == Set(
      (1L, "2025-03-15", "v1"),
      (1L, "2025-07-01", "v2"),
      (1L, "2026-01-01", "v2")))
  }
}
