package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Plan-shaping helpers shared by the pair-join operators. Both exist to
  * make the bench-scale plan fast WITHOUT hard-coding decisions that
  * invert at corpus scale: a `broadcast()` hint is a command, not a
  * heuristic, and an unconditional `repartition()` injects a full shuffle
  * into a scan that is already wide.
  */
private[graft] object ScaleHints {

  /** Broadcast hint gated on the optimizer's own size estimate.
    *
    * At bench scale (MB-sized sketch/dimension tables read from one small
    * parquet file) Spark's estimate is often just above the default 10 MB
    * auto-broadcast threshold because string/array widths are guessed
    * conservatively — the explicit hint recovers the broadcast join. At
    * corpus scale the same derived table estimates in the GB/TB range and
    * the hint would command a driver-OOM broadcast, so it is dropped and
    * the join keys (band/bucket ids) make the plan a plain shuffled
    * equi-join. The `factor` headroom (8 × threshold ≈ 80 MB by default)
    * is the cutover: wide enough to absorb estimate error on small
    * inputs, far below anything corpus-sized.
    */
  def maybeBroadcast(df: DataFrame, factor: Long = 8L): DataFrame = {
    val thresh = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    if (thresh > 0 &&
        df.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(thresh) * factor)
      broadcast(df)
    else df
  }

  /** Round-robin fan-out of the probe side of a pair join, gated on the
    * current partition count. A few-MB scan arrives as ONE partition, so
    * without this the whole O(n²) condition evaluation runs on one core
    * (measured: 483 s → 16 s on the sf0.1 ngram workload). A corpus-scale
    * scan is already wider than the target, so no shuffle is injected.
    */
  def fanout(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism * 2
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
