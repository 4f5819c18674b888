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

  /** Round-robin fan-out of the probe side of a pair join, gated on an
    * estimate of how wide the frame already is. A few-MB scan arrives as
    * ONE partition, so without this the whole O(n²) condition evaluation
    * runs on one core (measured: 483 s → 16 s on the sf0.1 ngram
    * workload). A corpus-scale scan is already wider than the target, so
    * no shuffle is injected.
    *
    * The width estimate is plan-derived, not `df.rdd.getNumPartitions`:
    * materializing the RDD lineage re-runs physical planning on every
    * call (every pair-join probe paid it). Instead: (1) a frame the
    * caller already repartitioned to >= target is left alone (the
    * Repartition node is visible in the optimized plan); (2) otherwise
    * estimated partitions = stats size / maxPartitionBytes — the same
    * inputs the file splitter uses, so the decision agrees with the RDD
    * count for scan-shaped probes. The estimate decides only whether a
    * round-robin exchange is added, never a result. */
  def fanout(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism * 2
    val plan = df.queryExecution.optimizedPlan
    val explicitlyWide = plan.collectFirst {
      case r: org.apache.spark.sql.catalyst.plans.logical.Repartition
        if r.numPartitions >= target => r
      case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression
        if r.optNumPartitions.exists(_ >= target) => r
    }.isDefined
    if (explicitlyWide) df
    else {
      // checkpoint-derived frames (LogicalRDD leaves) have NO usable
      // size statistics — computeStats falls back to defaultSizeInBytes
      // (Long.MaxValue), which would read as "already wide" and skip the
      // fan-out exactly when a 1-partition checkpoint needs it most. The
      // leaf RDD already exists, so its real partition count is free.
      val leafRddParts = plan.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.getNumPartitions
      }
      if (leafRddParts.nonEmpty) {
        if (leafRddParts.max >= target) df else df.repartition(target)
      } else {
        val maxPart = math.max(1L,
          df.sparkSession.sessionState.conf.filesMaxPartitionBytes)
        val estParts = plan.stats.sizeInBytes / maxPart
        if (estParts >= target) df else df.repartition(target)
      }
    }
  }
}
