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

  test("plan is an equi hash join on the bin, not a nested loop") {
    val points = Seq((1L, 10.0)).toDF("pid", "v")
    val ranges = Seq(("a", 0.0, 35.0)).toDF("rid", "lo", "hi")
    val plan = RangeJoin.pointInRange(points, "v", ranges, "lo", "hi", 32)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degenerated to a nested loop:\n$plan")
  }
}
