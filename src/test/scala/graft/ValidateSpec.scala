package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Validate
import graft.ops.Validate._

/** Expectations validator: every rule kind trips on a hand-built corpus
  * with known violations, and the whole rule set evaluates as one job. */
class ValidateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def results(rules: Seq[Rule]) = {
    val df = Seq(
      (1L, Option("alpha"), Option(5L), "en"),
      (2L, Option("beta"), Option(4L), "en"),
      (2L, None, Option(99L), "xx"),      // dup id, null text, out of range
      (3L, Option("g"), None, "de")       // null len → Predicate fails closed
    ).toDF("id", "text", "len", "lang")
    Validate.check(df, rules).collect()
      .map(r => r.getAs[String]("rule") ->
        ((r.getAs[Long]("metric"), r.getAs[Long]("n_violations"),
          r.getAs[Int]("pass")))).toMap
  }

  test("each rule kind counts its violations and fails only when tripped") {
    val dim = Seq(1L, 2L).toDF("key") // 3 is missing → one ref violation
    val got = results(Seq(
      NotNull("text_nn", "text"),
      Unique("id_uni", Seq("id")),
      InRange("len_range", "len", 1L, 10L),
      Matches("text_alpha", "text", "^[a-z]{2,}$"), // "g" too short
      OneOf("lang_ok", "lang", Seq("en", "de")),
      Predicate("len_consistent", col("len") === length(col("text"))),
      RefIn("id_in_dim", "id", dim, "key"),
      RowCountBetween("rows_min", 1L, Long.MaxValue),
      RowCountBetween("rows_tight", 100L, 200L)))
    assert(got("text_nn") == ((1L, 1L, 0)))
    assert(got("id_uni") == ((1L, 1L, 0)))      // 4 non-null − 3 distinct
    assert(got("len_range") == ((1L, 1L, 0)))   // 99
    assert(got("text_alpha") == ((1L, 1L, 0)))  // "g"
    assert(got("lang_ok") == ((1L, 1L, 0)))     // "xx"
    // row 3: 99 === length(null) → null pred → violation (fails closed);
    // row 4: null len → null pred → violation
    assert(got("len_consistent") == ((2L, 2L, 0)))
    assert(got("id_in_dim") == ((1L, 1L, 0)))   // the single id=3 row

    assert(got("rows_min") == ((4L, 0L, 1)))
    assert(got("rows_tight") == ((4L, 1L, 0)))
  }

  test("clean table passes every applicable rule") {
    val df = Seq((1L, "aa", 2L), (2L, "bbb", 3L)).toDF("id", "text", "len")
    val out = Validate.check(df, Seq(
      NotNull("nn", "text"),
      Unique("u", Seq("id")),
      InRange("r", "len", 1L, 10L),
      Predicate("p", col("len") === length(col("text"))),
      RowCountBetween("rc", 1L, 10L))).collect()
    assert(out.length == 5)
    assert(out.forall(_.getAs[Int]("pass") == 1))
    assert(out.forall(_.getAs[Long]("n_violations") == 0L))
  }

  test("empty input: row rules pass vacuously, count bound fails") {
    val df = Seq.empty[(Long, String)].toDF("id", "text")
    val got = Validate.check(df, Seq(
      NotNull("nn", "text"),
      Unique("u", Seq("id")),
      RowCountBetween("rc", 1L, 10L))).collect()
      .map(r => r.getAs[String]("rule") -> r.getAs[Int]("pass")).toMap
    assert(got == Map("nn" -> 1, "u" -> 1, "rc" -> 0))
  }
}
