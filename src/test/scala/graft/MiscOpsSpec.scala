package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{TextAnalysis, TopK}
import graft.sources.Sinks

/** Text-analytics, salted top-k, and per-key sink coverage. */
class MiscOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("langId picks the marker-dominant language with en-first tie-break") {
    val df = Seq(
      "the cat and the dog is here",
      "der hund und die katze ist das",
      "el gato es de los perros",
      "xyzzy plugh nothing",
      "the der"   // tie en=1/de=1 → en wins
    ).toDF("text")
    val got = df.select(TextAnalysis.langId($"text")).as[String].collect().toList
    assert(got == List("en", "de", "es", "und", "en"))
  }

  test("tokenStats and qualityScore count what they claim") {
    val df = Seq("the the quick fox 99").toDF("text")
    val stats = df.select(col("text") +: TextAnalysis.tokenStats($"text"): _*).collect()(0)
    assert(stats.getAs[Int]("n_tokens") == 5)
    assert(stats.getAs[Int]("n_uniq") == 4)
    assert(stats.getAs[Int]("n_alpha") == 5)
    val q = df.select(TextAnalysis.qualityScore($"text"): _*).collect()(0)
    assert(q.getAs[Int]("n_stop") == 2)
    // 0.7*(4/5) + 0.3*(2/5) = 0.68 → floor(68)
    assert(q.getAs[Long]("q_score") == 68L)
  }

  test("two-phase salted top-k equals the plain window top-k") {
    val rnd = new scala.util.Random(3)
    val df = (1 to 5000).map(i => (s"g${i % 3}", rnd.nextDouble() * 100, i.toLong))
      .toDF("g", "value", "id")
    val salted = TopK.perGroup(df, Seq(col("g")),
        Seq(col("value").desc, col("id")), Seq(col("id")), k = 7)
      .select("g", "id", "rk").as[(String, Long, Int)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("value").desc, col("id"))
    val plain = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 7)
      .select("g", "id", "rk").as[(String, Long, Int)].collect().toSet
    assert(salted == plain)
  }

  test("profile: nulls, exact distincts, min/max per column in one pass") {
    val df = Seq((1, Some("a")), (2, None), (3, Some("a")), (3, Some("b")))
      .toDF("id", "v")
    val got = graft.ops.Profile.profile(df)
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("id") == ("id", 4L, 0L, 3L, "1", "3"))
    assert(got("v") == ("v", 4L, 1L, 2L, "a", "b"))
  }

  test("mergeUpsert: updates win, untouched master rows survive") {
    val master = Seq((1, "m1"), (2, "m2"), (3, "m3")).toDF("id", "text")
    val updates = Seq((2, "u2"), (4, "u4")).toDF("id", "text")
    val got = graft.ops.Fingerprint.mergeUpsert(master, updates, "id")
      .as[(Int, String)].collect().toSet
    assert(got == Set((1, "m1"), (2, "u2"), (3, "m3"), (4, "u4")))
  }

  test("writePerKeyJson lays out one directory per key") {
    val dir = java.nio.file.Files.createTempDirectory("perkey").toString
    val df = Seq(("k1", 1), ("k2", 2), ("k1", 3)).toDF("rag_id", "v")
    Sinks.writePerKeyJson(df, "rag_id", dir)
    val sub = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("rag_id=")).sorted
    assert(sub.toList == List("rag_id=k1", "rag_id=k2"))
    assert(spark.read.json(s"$dir/rag_id=k1").count() == 2)
  }

  test("approx_count_distinct stays within 5% of exact on the testdata") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (c <- Seq("doc_id", "source", "lang", "n_chars")) {
      val exact = docs.select(countDistinct(col(c))).as[Long].head()
      val approx = docs.select(approx_count_distinct(c)).as[Long].head()
      val rel = math.abs(approx - exact).toDouble / exact
      assert(rel <= 0.05, s"$c: approx=$approx exact=$exact rel=$rel")
    }
  }
}
