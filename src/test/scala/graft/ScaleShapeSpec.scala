package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Metrics, Fingerprint}
import graft.sources.Sinks

/** Scale-shape evidence: metrics listener (A4) and bucketed-master
  * co-located anti-join (J1 at 100 TB: the master side must not shuffle). */
class ScaleShapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("metrics recorder captures per-action durations (A4)") {
    val (n, ms) = Metrics.recorded(spark) {
      spark.range(1000).filter($"id" % 7 === 0).count()
    }
    assert(n == 143)
    assert(ms.nonEmpty && ms.forall(!_.failed) && ms.exists(_.durationNs > 0))
  }

  test("bucketed master joins without an Exchange on the master side") {
    val master = (1 to 1000).map(i => (s"id$i", i)).toDF("rag_id", "v")
    Sinks.writeBucketedMaster(master, "graft_master_bucketed", buckets = 8)
    try {
      val fresh = (500 to 1500).map(i => (s"id$i", i)).toDF("rag_id", "v")
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val delta = Fingerprint.deltaAntiJoin(fresh,
          spark.table("graft_master_bucketed"), "rag_id")
        assert(delta.count() == 500) // ids 1001..1500
        val plan = delta.queryExecution.executedPlan.toString
        // exactly ONE exchange: the fresh side; the bucketed master scan
        // feeds the join directly
        val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
        assert(exchanges == 1, s"expected 1 exchange, got $exchanges in:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally spark.sql("DROP TABLE IF EXISTS graft_master_bucketed")
  }
}
