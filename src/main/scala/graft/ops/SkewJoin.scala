package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual key-salting for skewed equi joins — the pre-AQE escape hatch
  * that still matters when AQE can't help: skew inside an aggregation
  * feeding the join, or a build side too large to split at runtime.
  * AQE's skew-join handles most cases (and is on in Bench); this
  * operator is the deterministic, plannable form of the same idea.
  *
  * Semantics are EXACTLY a plain inner equi join (the salt is an
  * implementation detail): left rows scatter across `saltFactor`
  * sub-keys by a deterministic hash of the whole row's partition
  * identity, the right side replicates once per sub-key, and the join
  * key becomes (key, salt) — a hot key's rows now land on `saltFactor`
  * reducers instead of one. Cost: right side replicated ×saltFactor, so
  * keep the factor small and the right side the smaller input.
  */
object SkewJoin {

  import ScaleHints.fanout

  /** Inner equi join on `key` with the left side salted `saltFactor`
    * ways; `distributeBy` names a left column whose hash spreads rows of
    * the same key (an id column — NOT the join key, which would put the
    * whole hot key back on one salt). */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String,
      distributeBy: String, saltFactor: Int): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val l = fanout(left).withColumn("__salt",
      pmod(hash(col(distributeBy)), lit(saltFactor)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
