package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Components

/** Connected components must be transitive (the whole point vs raw
  * pairs), deterministic (component = min member id), and converge on
  * long chains well inside the iteration cap (pointer jumping). */
class ComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("transitive clusters and isolated pairs") {
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 4L), (7L, 8L), (3L, 9L))
      .toDF("i", "j")
    val got = Components.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L,
      4L -> 4L, 5L -> 4L, 7L -> 7L, 8L -> 7L))
  }

  test("a 200-node chain converges inside the iteration cap") {
    val edges = (0L until 199L).map(i => (i, i + 1)).toDF("i", "j")
    val got = Components.connectedComponents(edges)
      .as[(Long, Long)].collect()
    assert(got.length == 200)
    assert(got.forall(_._2 == 0L), "every chain node must reach label 0")
  }

  test("an unconverged run throws instead of returning split labels") {
    val edges = (0L until 20L).map(i => (i, i + 1)).toDF("i", "j")
    val ex = intercept[IllegalStateException] {
      Components.connectedComponents(edges, maxIter = 1).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("dupGroups keys every cluster by its smallest member") {
    val edges = Seq((10L, 11L), (11L, 12L), (20L, 21L)).toDF("i", "j")
    val got = Components.dupGroups(edges)
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set((10L, 3L, "10,11,12"), (20L, 2L, "20,21")))
  }

  test("labelPropagation: distance-bounded spread, clamp, smallest-label ties") {
    import graft.ops.PageRank
    // path 1—2—3 plus node 4 adjacent to both seeds 1 and 5
    val edges = PageRank.symmetrize(
      Seq((1L, 2L), (2L, 3L), (1L, 4L), (5L, 4L)).toDF("a", "b"), "a", "b")
    val seeds = Seq((1L, 7L), (5L, 3L)).toDF("node", "label")

    val one = Components.labelPropagation(edges, seeds, "node", "label", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // one round: 2 and 4 labeled; 3 out of reach; tie at 4 → min(7,3)=3
    assert(one == Map(1L -> 7L, 5L -> 3L, 2L -> 7L, 4L -> 3L))

    val two = Components.labelPropagation(edges, seeds, "node", "label", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round two reaches 3 through 2; seeds stay clamped
    assert(two == Map(1L -> 7L, 5L -> 3L, 2L -> 7L, 3L -> 7L, 4L -> 3L))
  }

  test("labelPropagation shuffle fallback (gate closed) equals the " +
      "broadcast path") {
    import graft.ops.PageRank
    def h(x: Long): Long = { var v = x * 2654435761L; v ^= v >>> 13; math.abs(v) }
    val edges = PageRank.symmetrize(
      (1L to 300L).map(i => (h(i) % 30, h(i * 11 + 5) % 30))
        .filter(p => p._1 != p._2).toDF("a", "b"), "a", "b")
    val seeds = Seq((1L, 7L), (5L, 3L), (9L, 11L)).toDF("node", "label")
    val conf = spark.conf
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      saved.keys.foreach(conf.set(_, "-1"))
      val viaB = Components.labelPropagation(edges, seeds, "node", "label", 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val viaS = Components.labelPropagation(edges, seeds, "node", "label", 3,
          broadcastMaxNodes = 0)
      val rs = viaS.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaB == rs)
      assert(rs.size >= seeds.count())
      // the gate-closed vote join must be the shuffled shape
      assert(!viaS.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _)) }
  }

  test("triangleCounts: hand graph, K4 closure, hub without triangles") {
    import spark.implicits._
    // triangle {1,2,3} with pendant 4 off node 3
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("i", "j")
    val got = Components.triangleCounts(tri)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)))).toMap
    assert(got(1L) == ((2L, 1L, Some(1000L))))
    assert(got(2L) == ((2L, 1L, Some(1000L))))
    assert(got(3L) == ((3L, 1L, Some(333L))))
    assert(got(4L) == ((1L, 0L, None)))

    // K4: every node in 3 triangles, coefficient exactly 1; duplicate and
    // reversed input edges must not change anything
    val k4 = (for { a <- 1 to 4; b <- 1 to 4 if a != b } yield
      (a.toLong, b.toLong)).toDF("i", "j")
    val k4got = Components.triangleCounts(k4)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(k4got.length == 4 && k4got.forall(_ == ((3L, 3L, 1000L))))

    // star hub: high degree, zero triangles — the case orientation keeps
    // cheap (all edges point away from the leaves, none close)
    val star = (2L to 9L).map(l => (1L, l)).toDF("i", "j")
    val sgot = Components.triangleCounts(star)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sgot.values.forall(_ == 0L))
  }
}
