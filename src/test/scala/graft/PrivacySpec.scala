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
