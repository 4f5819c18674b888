package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** CPython-golden parity for the pubmed_enrichment verify-path string
  * normalizers (tools/gen_goldens.py, AST-extracted from the reference):
  *
  *  - normalize_text (F7): `[^\w\s]` / `\s+` with CPython's UNICODE
  *    classes — β/naïve/CJK word chars survive, NBSP-family runs
  *    collapse, the strip is the unicode strip
  *  - normalize_doi (F8): unicode strip + `doi:\s*` with unicode \s
  *  - the clean-title expression (F11): strip FIRST, `[;:,]` → space,
  *    NO outer strip — a boundary `,;:` leaves a space
  *
  * These pin exactly the ASCII-vs-unicode class gaps the r13 fix closed
  * (the pre-r13 ports fail 9 of these 21 cases). */
class PubmedNormSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(colExpr: org.apache.spark.sql.Column, input: String): String =
    Seq(input).toDF("c").select(colExpr.as("r")).collect()(0).getString(0)

  Goldens.load("pubmed_norm").zipWithIndex.foreach { case (g, i) =>
    val kind = Goldens.str(g("kind"))
    test(s"pubmed normalize golden #$i ($kind)") {
      val in = Goldens.str(g("input"))
      val expected = Goldens.str(g("expected"))
      val got = kind match {
        case "text"  => one(TextOps.normalizeForCompare(col("c")), in)
        case "doi"   => one(TextOps.normalizeDoi(col("c")), in)
        case "title" => one(TextOps.cleanTitleForSearch(col("c")), in)
      }
      assert(got == expected,
        s"$kind(${in.map(c => f"$c%c(${c.toInt}%04x)").mkString}) " +
          s"expected '$expected' got '$got'")
    }
  }
}
