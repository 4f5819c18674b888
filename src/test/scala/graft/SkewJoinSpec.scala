package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.SkewJoin

/** Salting is an implementation detail: the salted join must equal the
  * plain equi join row-for-row, including a pathologically hot key. */
class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted equi join equals the plain join on a hot-key workload") {
    val left = ((1 to 500).map(i => (1L, i)) ++ Seq((2L, 900), (3L, 901)))
      .toDF("k", "lid")                       // key 1 holds 500 of 502 rows
    val right = Seq((1L, "a"), (2L, "b"), (4L, "d")).toDF("k", "rv")
    val plain = left.join(right, "k")
      .select("k", "lid", "rv").as[(Long, Int, String)].collect().toSet
    val salted = SkewJoin.saltedEquiJoin(left, right, "k", "lid", saltFactor = 8)
      .select("k", "lid", "rv").as[(Long, Int, String)].collect().toSet
    assert(salted == plain)
    assert(plain.size == 501)                 // 500 hot + 1, key 3/4 drop
  }

  test("hot-key salted join equals the plain join; only hot keys salt") {
    val left = ((1 to 500).map(i => (1L, i)) ++ (900 to 920).map(i => (i.toLong, i)))
      .toDF("k", "lid")                       // key 1 hot, 900..920 singletons
    val right = ((1L to 5L) ++ (900L to 910L)).map(k => (k, s"v$k")).toDF("k", "rv")
    val plain = left.join(right, "k")
      .select("k", "lid", "rv").as[(Long, Int, String)].collect().toSet
    val targeted = SkewJoin.saltedHotKeyJoin(left, right, "k", "lid",
        saltFactor = 8, hotThreshold = 100)
      .select("k", "lid", "rv").as[(Long, Int, String)].collect().toSet
    assert(targeted == plain)
    assert(plain.size == 511)                 // 500 hot + 11 cold singletons

    // one-pass shape: a SINGLE join (no hot/cold split-and-union — the
    // big side is scanned once), with the right side exploded over the
    // per-key salt sequence
    val planStr = SkewJoin.saltedHotKeyJoin(left, right, "k", "lid",
      saltFactor = 8, hotThreshold = 100).queryExecution.optimizedPlan.toString
    assert(!planStr.contains("Union"))
    assert(planStr.toLowerCase.contains("explode"))
  }

  test("hot-key salted join with caller-supplied keyCounts skips detection") {
    val left = ((1 to 300).map(i => (1L, i)) ++ Seq((2L, 900), (3L, 901)))
      .toDF("k", "lid")
    val right = Seq((1L, "a"), (2L, "b")).toDF("k", "rv")
    val counts = left.groupBy("k").agg(count(lit(1)).as("__n"))
    val plain = left.join(right, "k")
      .select("k", "lid", "rv").as[(Long, Int, String)].collect().toSet
    val got = SkewJoin.saltedHotKeyJoin(left, right, "k", "lid",
        saltFactor = 4, hotThreshold = 100, keyCounts = Some(counts))
      .select("k", "lid", "rv").as[(Long, Int, String)].collect().toSet
    assert(got == plain)
  }
}
