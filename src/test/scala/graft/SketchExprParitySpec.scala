package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import graft.expr.sketchFunctions
import graft.ops.{Dedup, Sketches}

/** Kernel-vs-SQL parity pins for the bit-twiddling codegen kernels whose
  * former spellings were plain SQL — a regression in the byte slicing must
  * surface in `sbt test`, not only in a full DuckDB-oracle Verify run —
  * plus the input-type contracts (plan-time AnalysisException, never a
  * mid-job codegen crash). */
class SketchExprParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val edge = Seq("", " ", "a", "päper–λ≥é", "a b  c", "\tx\ny",
    "0123456789abcdef" * 40, "ü" * 7)
  private lazy val corpus = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("text")).limit(200)
    .unionAll(edge.toDF("text"))

  test("md5_prefix60 == conv(substring(md5(k),1,15),16,10), string and binary") {
    val mism = corpus
      .withColumn("kern", sketchFunctions.md5_prefix60(col("text")))
      .withColumn("sql",
        expr("cast(conv(substring(md5(text), 1, 15), 16, 10) as bigint)"))
      .withColumn("kern_bin",
        sketchFunctions.md5_prefix60(col("text").cast("binary")))
      .filter(col("kern") =!= col("sql") || col("kern_bin") =!= col("sql"))
      .count()
    assert(mism == 0)
  }

  test("md5_prefix60 rejects a non-string/binary key at plan time") {
    val df = Seq(1L, 2L).toDF("k")
    val e = intercept[AnalysisException] {
      df.select(sketchFunctions.md5_prefix60(col("k"))).schema
    }
    assert(e.getMessage.toLowerCase.contains("type"))
  }

  test("cms_buckets == the conv(substring(md5(item),1+4i,4),16,10) % w slices") {
    val (w, d) = (1000, 4)
    val sqlBuckets = array((0 until d).map(i =>
      expr(s"cast(conv(substring(md5(text), ${1 + 4 * i}, 4), 16, 10) as bigint) % $w")): _*)
    val mism = corpus
      .withColumn("kern", sketchFunctions.cms_buckets(col("text"), w, d))
      .withColumn("sql", sqlBuckets)
      .filter(col("kern") =!= col("sql"))
      .count()
    assert(mism == 0)
  }

  test("winnowed_hash_set == distinct winnowedRuns hashes") {
    val got = corpus.select(col("text"),
        sketchFunctions.winnowed_hash_set(coalesce(col("text"), lit("")))
          .as("hs"))
      .as[(String, Seq[Long])].collect()
    assert(got.nonEmpty)
    got.foreach { case (text, hs) =>
      val want = Sketches.winnowedRuns(if (text == null) "" else text)
        .map(_._3).distinct.toSeq
      assert(hs.sorted == want.sorted, s"mismatch on ${text.take(40)}")
      assert(hs.distinct == hs, "kernel output must be deduped")
    }
  }

  test("string kernels implicit-cast atomics and reject non-atomic input at plan time") {
    // an int column tokenizes exactly like its string cast (split() semantics)
    val ints = Seq(12345, 7).toDF("k")
    val both = ints.select(
        sketchFunctions.sliding_grams(col("k"), 1).as("a"),
        sketchFunctions.sliding_grams(col("k").cast("string"), 1).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(both == 0)
    intercept[AnalysisException] {
      Seq(Seq(1, 2)).toDF("k")
        .select(sketchFunctions.sliding_grams(col("k"), 1)).schema
    }
  }

  test("winnowOverlapPairs(assumeUniqueIds=false) on duplicated ids == unique-id input") {
    val quoted = "the quick brown fox jumps over the lazy dog tonight again"
    val base = Seq(
      (1L, "intro " + quoted + " tail one"),
      (2L, "other " + quoted + " tail two"),
      (3L, "unrelated content about shuffle partitions entirely"))
      .toDF("doc_id", "text")
    // duplicate every row: under assumeUniqueIds = true the (id, h)
    // stream doubles (df doubles, n_shared doubles); the default's
    // explicit distinct restores the corpus-wide dedup exactly
    val dup = base.unionAll(base)
    def run(df: org.apache.spark.sql.DataFrame, unique: Boolean) =
      Dedup.winnowOverlapPairs(df, "doc_id", "text", minShared = 3L,
          maxDf = 4, assumeUniqueIds = unique)
        .as[(Long, Long, Long)].collect().toSet
    assert(run(dup, unique = false) == run(base, unique = true))
  }
}
