package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Privacy, Contamination}

/** Hand-verified PII redaction and contamination semantics (both ops are
  * also hash-checked end-to-end against the DuckDB oracle via the
  * text_pii_redact / text_contamination driver queries). */
class PrivacySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("redactPii: each family tagged, surrounding text intact, order safe") {
    val df = Seq(
      "mail a.b+c@ex-1.org now",
      "host 10.0.255.7 up",
      "ssn 123-45-6789 leaked",
      "call 415-555-0199 or 415 555 0199",
      "overlap 123-45-6789 and joe@x.io on 1.2.3.4",
      "clean text with 12345 and a.b"
    ).toDF("t").select(Privacy.redactPii($"t").as("r"))
    val got = df.as[String].collect().toList
    assert(got == List(
      "mail <EMAIL> now",
      "host <IP> up",
      "ssn <SSN> leaked",
      "call <PHONE> or <PHONE>",
      "overlap <SSN> and <EMAIL> on <IP>",
      "clean text with 12345 and a.b"))
  }

  test("piiStats counts match the families present") {
    val row = Seq("a@b.co c@d.io 1.2.3.4 999-88-7777")
      .toDF("t").select(Privacy.piiStats($"t"): _*)
      .as[(Int, Int, Int, Int)].collect().head
    assert(row == ((2, 1, 1, 0)))
  }

  test("kAnonymity flags sub-k groups; boundary n == k is safe") {
    val df = Seq(
      ("en", "a"), ("en", "a"), ("en", "a"),     // n=3 == k → safe
      ("en", "b"), ("en", "b"),                  // n=2 < k → at risk
      ("de", "a")).toDF("lang", "src")           // n=1 < k → at risk
    val got = Privacy.kAnonymity(df, Seq("lang", "src"), k = 3L).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n"), r.getAs[Int]("at_risk")))).toMap
    assert(got == Map(
      ("en", "a") -> ((3L, 0)),
      ("en", "b") -> ((2L, 1)),
      ("de", "a") -> ((1L, 1))))
  }

  test("suppressSmallGroups keeps exactly the rows of ≥k groups") {
    val df = Seq(
      (1L, "en", "a"), (2L, "en", "a"), (3L, "en", "a"),
      (4L, "en", "b"), (5L, "en", "b"),
      (6L, "de", "a")).toDF("id", "lang", "src")
    val kept = Privacy.suppressSmallGroups(df, Seq("lang", "src"), k = 3L)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L))
    // suppressed table still has the original schema
    assert(Privacy.suppressSmallGroups(df, Seq("lang", "src"), k = 3L)
      .columns.toSeq == Seq("id", "lang", "src"))
  }

  test("benchmarkOverlap: contained doc fully contaminated, novel doc at zero") {
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("id", "text")
    val bench = Seq(
      (10L, "alpha beta gamma delta"),   // all 2 trigrams in corpus
      (11L, "nov elty words only here"), // none
      (12L, "beta gamma delta unseen tail") // partial
    ).toDF("id", "text")
    val out = Contamination.benchmarkOverlap(corpus, "text", bench, "id", "text", k = 3)
      .select("id", "contamination").as[(Long, Double)].collect().toMap
    assert(out(10L) == 1.0)
    assert(out(11L) == 0.0)
    assert(out(12L) > 0.0 && out(12L) < 1.0)
  }
}
