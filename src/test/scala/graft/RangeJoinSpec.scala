package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

/** Banded range join: boundary inclusivity, overlap multi-match, misses,
  * and the plan must be an equi hash join — never a nested loop. */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("points match every containing range, boundaries inclusive") {
    val points = Seq((1L, 10.0), (2L, 35.0), (3L, 64.0), (4L, 999.0))
      .toDF("pid", "v")
    val ranges = Seq(("a", 0.0, 35.0), ("b", 30.0, 70.0), ("c", 64.0, 64.0))
      .toDF("rid", "lo", "hi")
    val got = RangeJoin.pointInRange(points, "v", ranges, "lo", "hi", 32)
      .select("pid", "rid").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "a"), (2L, "b"), (3L, "b"), (3L, "c")))
  }

  test("interval overlap: exactly-once across shared bins, touching edges match") {
    val l = Seq(("L1", 0.0, 100.0), ("L2", 50.0, 60.0), ("L3", 200.0, 210.0))
      .toDF("lid", "n_lo", "n_hi")
    val r = Seq(("R1", 90.0, 150.0), ("R2", 100.0, 110.0), ("R3", 55.0, 58.0),
      ("R4", 300.0, 310.0)).toDF("rid", "r_lo", "r_hi")
    val got = graft.ops.RangeJoin.intervalOverlap(l, "n_lo", "n_hi",
        r, "r_lo", "r_hi", binWidth = 32)
      .select("lid", "rid").as[(String, String)].collect().toList
    // exactly-once even though L1 and R1 share several 32-wide bins
    assert(got.size == got.toSet.size, s"duplicated pairs: $got")
    assert(got.toSet == Set(("L1", "R1"), ("L1", "R2"), ("L1", "R3"), ("L2", "R3")))
  }

  test("plan is an equi hash join on the bin, not a nested loop") {
    val points = Seq((1L, 10.0)).toDF("pid", "v")
    val ranges = Seq(("a", 0.0, 35.0)).toDF("rid", "lo", "hi")
    val plan = RangeJoin.pointInRange(points, "v", ranges, "lo", "hi", 32)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degenerated to a nested loop:\n$plan")
  }
}
