package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.AsofJoin

/** The union+window as-of composition: inclusive <= match, per-key
  * isolation, null when nothing precedes, forward carry across gaps. */
class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("most recent right row at-or-before each left row, per key") {
    val left = Seq(
      ("k1", 5L, "a"), ("k1", 10L, "b"), ("k1", 15L, "c"), ("k1", 25L, "d"),
      ("k2", 12L, "e")
    ).toDF("key", "ts", "tag")
    val right = Seq(
      ("k1", 10L, 1.0), ("k1", 20L, 2.0),
      ("k2", 11L, 9.0)
    ).toDF("key", "ts", "v")
    val got = AsofJoin.asofJoin(left, right, "key", "ts", Seq("v"))
      .select("key", "ts", "tag", "v")
      .as[(String, Long, String, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(got(("k1", 5L)).isEmpty)          // nothing precedes
    assert(got(("k1", 10L)).contains(1.0))   // inclusive <=
    assert(got(("k1", 15L)).contains(1.0))   // carry across gap
    assert(got(("k1", 25L)).contains(2.0))
    assert(got(("k2", 12L)).contains(9.0))   // key isolation
  }

  test("NULL payload on the matched row stays NULL (no stale carry)") {
    val left = Seq(("k1", 10L), ("k1", 20L)).toDF("key", "ts")
    val right = Seq(
      ("k1", 5L, Some(1.0)), ("k1", 15L, None) // newer row has NULL v
    ).toDF("key", "ts", "v")
    val got = AsofJoin.asofJoin(left, right, "key", "ts", Seq("v"))
      .select("ts", "v").as[(Long, Option[Double])].collect().toMap
    assert(got(10L).contains(1.0))
    assert(got(20L).isEmpty) // matched row (ts=15) carries NULL, not 1.0
  }

  test("multiple valueCols always come from the SAME matched right row") {
    val left = Seq(("k1", 10L), ("k1", 20L)).toDF("key", "ts")
    val right = Seq(
      ("k1", 5L, Some("a"), Some(1.0)),
      ("k1", 15L, None, Some(2.0)) // a NULL in one col must not mix rows
    ).toDF("key", "ts", "s", "v")
    val got = AsofJoin.asofJoin(left, right, "key", "ts", Seq("s", "v"))
      .select("ts", "s", "v")
      .as[(Long, Option[String], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(10L) == ((Some("a"), Some(1.0))))
    assert(got(20L) == ((None, Some(2.0)))) // both fields from ts=15 row
  }
}
