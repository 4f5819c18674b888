package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel conversion — the ClickHouse `windowFunnel` staple of
  * event analytics: for each user, how deep into a stage sequence
  * (view → click → purchase …) their events got, with every later stage
  * strictly after the previous one and the whole walk inside a time
  * window anchored at stage 1.
  *
  * Semantics are EARLIEST-ANCHOR GREEDY: t1 = min ts of stage 1, then
  * each next stage's earliest event with ts > t(prev) and
  * ts ≤ t1 + window. Greedy-earliest is deterministic and identical to
  * successive conditional mins — which is exactly how the SQL oracle
  * replays it. (Like ClickHouse, it can under-count vs an optimal later
  * anchor; that is the documented trade for a one-pass walk.)
  *
  * Scale shape: ONE shuffle (groupBy user, collect each user's stage
  * events), then a codegen'd array_sort + aggregate HOF walks the
  * bounded per-user list — never k joins for k stages, state is three
  * scalars per user regardless of event count. Skew bound = the
  * busiest user's event count, same as any per-entity session op.
  */
object Funnel {

  /** (user, t1, depth) for every user who entered the funnel (depth ≥ 1
    * means stage 1 was seen; depth = stages.length is full conversion).
    * `windowSec` bounds the whole walk relative to t1. */
  def funnelDepth(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String], windowSec: Long): DataFrame = {
    require(stages.nonEmpty, "stages must be non-empty")
    val k = stages.length
    val windowMicros = windowSec * 1000000L
    val stageIdx = stages.zipWithIndex.foldLeft(lit(0)) {
      case (acc, (s, i)) => when(col(typeCol) === s, lit(i + 1)).otherwise(acc)
    }
    val evs = events
      .select(col(userCol).as("user_id"), unix_micros(col(tsCol)).as("tsu"),
        stageIdx.as("stage"))
      .filter(col("stage") > 0)
    val nullL = lit(null).cast("long")
    val init = struct(lit(0).as("depth"), nullL.as("anchor"), nullL.as("last"))
    val walk = (acc: Column, ev: Column) => {
      val depth = acc.getField("depth")
      val anchor = acc.getField("anchor")
      val last = acc.getField("last")
      val ts = ev.getField("tsu")
      val st = ev.getField("stage")
      val start = (depth === 0) && (st === 1)
      val advance = (depth > 0) && (depth < k) && (st === depth + 1) &&
        (ts > last) && (ts <= anchor + windowMicros)
      struct(
        when(start, lit(1)).when(advance, depth + 1).otherwise(depth).as("depth"),
        when(start, ts).otherwise(anchor).as("anchor"),
        when(start, ts).when(advance, ts).otherwise(last).as("last"))
    }
    evs.groupBy("user_id")
      .agg(array_sort(collect_list(struct(col("tsu"), col("stage")))).as("evs"))
      .select(col("user_id"),
        aggregate(col("evs"), init, walk).as("w"))
      .filter(col("w.depth") >= 1)
      .select(col("user_id"),
        expr("timestamp_micros(w.anchor)").as("t1"),
        col("w.depth").as("depth"))
  }

  /** Cohort retention matrix — the other event-analytics staple: users
    * cohorted by first-seen day, and for each (cohort, day-offset) cell
    * the count of distinct users active that many days after their
    * first day. Two hash shuffles (first-seen min per user, then the
    * cohort-cell distinct count); the user→cohort join keys on user_id
    * so AQE sizes it, never a cartesian. */
  def retentionCohorts(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val e = events.select(col(userCol).as("user_id"),
      to_date(col(tsCol)).as("day"))
    val first = e.groupBy("user_id").agg(min(col("day")).as("cohort"))
    e.join(first, Seq("user_id"))
      .groupBy(col("cohort"), datediff(col("day"), col("cohort")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Top entry paths — the Sankey/path-analysis query: each user's first
    * `pathLen` event types in time order (ties broken by `tieCol`, which
    * must be unique per row for a deterministic path), counted and
    * ranked. Two shuffles: per-user ordered collect, then the path
    * count; top-k via TakeOrdered, never a global sort. The per-user
    * state is bounded by `pathLen` after the slice, so a power user
    * costs no more than anyone else downstream. */
  def topPaths(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, tieCol: String, pathLen: Int, k: Int): DataFrame = {
    val paths = events
      .select(col(userCol).as("user_id"), unix_micros(col(tsCol)).as("tsu"),
        col(tieCol).as("tie"), col(typeCol).as("etype"))
      .groupBy("user_id")
      .agg(concat_ws(">", transform(
        slice(array_sort(collect_list(struct(col("tsu"), col("tie"),
          col("etype")))), 1, pathLen),
        e => e.getField("etype"))).as("path"))
    paths.groupBy("path").agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path").asc)
      .limit(k)
  }

  /** Rolling distinct actives (the DAU/WAU/MAU family): for every day,
    * the count of distinct users seen in the trailing `windowDays`
    * window. Each (user, day) pair — already deduped, so the fan-out is
    * bounded by actives×window, not events×window — contributes to the
    * `windowDays` window-ends it falls inside, then one distinct count
    * per window-end. Trailing windows at the corpus edge are partial by
    * construction (day 1's "7-day" window holds 1 day) — the standard
    * convention, identical in the oracle. */
  def rollingActives(events: DataFrame, userCol: String, tsCol: String,
      windowDays: Int): DataFrame = {
    require(windowDays > 0, "windowDays must be positive")
    val pairs = events
      .select(col(userCol).as("user_id"), to_date(col(tsCol)).as("day"))
      .distinct()
    pairs
      .select(col("user_id"), explode(sequence(col("day"),
        date_add(col("day"), windowDays - 1))).as("window_end"))
      .join(pairs.select(col("day").as("window_end")).distinct(), Seq("window_end"))
      .groupBy("window_end")
      .agg(countDistinct(col("user_id")).as("n_active"))
  }

  /** Event-rate anomaly detection: per (type, time bucket) counts scored
    * against a TRAILING baseline window — the ops-side spike/drop
    * detector (ingest stalls, bot bursts) run as pure SQL windows. The
    * baseline excludes the current bucket (RANGE −trail..−1 on the
    * bucket index), so a spike can't vote itself normal; moments come
    * from exact integer sums inside the frame (n, Σx, Σx² — counts are
    * bucket-bounded, no overflow at any realistic rate) and the z-score
    * floors to milli AFTER one shared double expression, the engine-
    * exactness pattern of zscorePerGroup. One shuffle on the type key;
    * the window walks each type's buckets in order. Buckets with fewer
    * than 2 baseline points or zero variance emit NULL z. */
  def rateAnomaly(events: DataFrame, typeCol: String, tsCol: String,
      bucketSec: Long = 3600L, trailBuckets: Int = 24): DataFrame = {
    val bucket = (col(tsCol).cast("long") / bucketSec).cast("long")
    val counts = events.groupBy(col(typeCol), bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(typeCol)).orderBy(col("bucket"))
      .rangeBetween(-trailBuckets.toLong, -1L)
    val bn = count(col("n")).over(w)
    val bs = sum(col("n")).over(w)
    val bs2 = sum(col("n") * col("n")).over(w)
    val mean = bs.cast("double") / bn.cast("double")
    val variance = (bs2.cast("double") - bs.cast("double") * bs.cast("double")
      / bn.cast("double")) / (bn.cast("double") - 1.0)
    counts
      .withColumn("z_milli",
        when(bn >= 2 && variance > 0,
          floor(lit(1000.0) * (col("n").cast("double") - mean)
            / sqrt(variance)).cast("long")))
      .withColumn("spike",
        coalesce((col("z_milli") >= 3000L).cast("int"), lit(0)))
  }

  /** Daily active decomposition into NEW vs RETURNING users (the growth
    * twin of [[rollingActives]]): per observed day, distinct actives and
    * how many were seen for the first time that day. Two hash shuffles
    * ((user, day) dedup + first-day aggregate reuse the same user-keyed
    * partitioning) and a day-keyed rollup; the first-seen table is
    * users-sized and joins back on the key both sides are already
    * hashed on. */
  def newVsReturning(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val pairs = events
      .select(col(userCol).as("user_id"), to_date(col(tsCol)).as("day"))
      .distinct()
    val firstSeen = pairs.groupBy("user_id").agg(min("day").as("first_day"))
    pairs.join(firstSeen, Seq("user_id"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_active"),
        count(when(col("day") === col("first_day"), 1)).as("n_new"))
  }

  /** Half-life-decayed engagement score per key: recent activity counts
    * in full, older activity at value/2^(age/halfLife) — the freshness
    * weighting behind "recently active users/documents first" ranking.
    *
    * Engine-exact by construction: the decay is a POWER-OF-TWO SHIFT on
    * an integer-quantized value (v_milli div 2^k), never exp() — exp is
    * not correctly rounded in either engine, so an exp-based score can
    * flip a floor at a boundary (cf. the quality-classifier margin
    * lesson); the shift is exact at every age. Age anchors to the
    * corpus max timestamp (deterministic — no wall clock), microsecond
    * integer arithmetic, k capped at 62 so the shift never overflows.
    * One 1-row broadcast + one key-partitioned aggregate. */
  def halfLifeDecayScore(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, halfLifeHours: Long): DataFrame = {
    require(halfLifeHours >= 1)
    val ref = events.agg(max(col(tsCol)).as("__tref"))
    events.crossJoin(broadcast(ref))
      .withColumn("__k", least(
        expr(s"(unix_micros(__tref) - unix_micros($tsCol)) div " +
          s"${3600000000L * halfLifeHours}L"),
        lit(62L)))
      .withColumn("__dv", expr(s"CAST(floor(1000 * $valueCol) AS BIGINT) " +
        "div shiftleft(CAST(1 AS BIGINT), CAST(__k AS INT))"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum("__dv").cast("long").as("decay_score_milli"))
  }
}
