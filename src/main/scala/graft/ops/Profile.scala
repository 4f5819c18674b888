package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** One-pass data profiling — the constraint/quality summary a 100 TB
  * ingest job runs before committing a batch (the Deequ/dbt-test shape):
  * per column its null count, exact distinct count, and min/max, as ONE
  * aggregate over the scan. Everything is a plain hash aggregate —
  * `count(distinct)` per column expands to the standard expand-plan, so
  * the pass stays shuffle-bounded and columnar; no driver-side loops.
  *
  * Output is LONG-format (one row per column) so downstream checks are
  * joins against expectation tables, and min/max are stringified so one
  * schema fits every column type.
  */
object Profile {

  /** (column, n_rows, n_null, n_distinct, min_str, max_str) for each of
    * `cols` (default: every column of `df`). */
  def profile(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val targets = if (cols.nonEmpty) cols else df.columns.toIndexedSeq
    val aggs = targets.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__rows_$c"),
        count(when(col(c).isNull, 1)).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = targets.map { c =>
      struct(lit(c).as("column"),
        col(s"__rows_$c").as("n_rows"), col(s"__null_$c").as("n_null"),
        col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_str"), col(s"__max_$c").as("max_str"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** Snapshot-to-snapshot profile drift — the monitoring loop closed
    * over [[profile]]: run the one-pass profile on the current and prior
    * corpus versions, join per column, and flag what moved. Drift flags
    * are integer-exact (cross-multiplied ratios, string equality on
    * min/max) so alert thresholds fire identically on any engine:
    *
    *  - `minmax_changed`: the observed value range moved (new out-of-
    *    range values, or a trim);
    *  - `dist_drift`: the distinct-per-row ratio moved by more than
    *    `ratioDeltaPct`% relative — |dc·rp − dp·rc| · 100 > pct · dp·rc
    *    (a key column collapsing, or an enum sprouting values);
    *  - `null_drift`: same cross-multiplied test on the null fraction.
    *
    * Cost: two single-pass profiles (each one aggregate over its scan)
    * + a join of two column-count-sized tables — the drift report is
    * free compared to either scan. */
  def profileDrift(cur: DataFrame, prior: DataFrame,
      cols: Seq[String] = Nil, ratioDeltaPct: Int = 10): DataFrame = {
    def side(df: DataFrame, tag: String) =
      profile(df, cols).select(col("column").as("col_name"),
        col("n_rows").as(s"rows_$tag"), col("n_null").as(s"null_$tag"),
        col("n_distinct").as(s"dist_$tag"),
        col("min_str").as(s"min_$tag"), col("max_str").as(s"max_$tag"))
    def crossDrift(aNum: Column, aDen: Column, bNum: Column, bDen: Column) =
      (abs(aNum * bDen - bNum * aDen) * 100 >
        lit(ratioDeltaPct) * bNum * aDen).cast("int")
    side(cur, "cur").join(side(prior, "prev"), Seq("col_name"))
      .withColumn("minmax_changed",
        (col("min_cur") =!= col("min_prev") ||
          col("max_cur") =!= col("max_prev")).cast("int"))
      .withColumn("dist_drift", crossDrift(
        col("dist_cur"), col("rows_cur"), col("dist_prev"), col("rows_prev")))
      .withColumn("null_drift", crossDrift(
        col("null_cur"), col("rows_cur"), col("null_prev"), col("rows_prev")))
      .drop("min_cur", "max_cur", "min_prev", "max_prev")
  }

  /** Per-group standardization (outlier scoring) of an integer metric:
    * attach each row's z-score within its group, as floored milli-units.
    *
    * The moments come from EXACT integer sums (Σx, Σx², n — one partial-
    * aggregated shuffle on the group key), never from a distributed
    * floating `stddev` whose merge order is nondeterministic; the double
    * arithmetic downstream is the same expression tree on both engines
    * over those exact integers, so the result is bit-reproducible:
    * mean = S/n, var = (S2 − S·S/n)/(n−1), z = (x − mean)/√var.
    * Groups with n < 2 or zero variance emit NULL. The stats table is
    * group-cardinality-sized — tiny — so the join back is a broadcast. */
  def zscorePerGroup(df: DataFrame, groupCol: String, metricCol: String):
      DataFrame = {
    val x = col(metricCol).cast("long")
    // Σx² accumulates in decimal(38,0): a LongType square-sum silently
    // wraps once |x| passes ~3e9·√n — decimal keeps the sum exact for
    // any realistic metric and still converts losslessly to double below
    val xd = col(metricCol).cast("decimal(38,0)")
    val stats = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("__n"), sum(x).as("__s"), sum(xd * xd).as("__s2"))
    val n = col("__n").cast("double")
    val s = col("__s").cast("double")
    val mean = s / n
    val variance = (col("__s2").cast("double") - s * s / n) / (n - lit(1))
    df.join(ScaleHints.maybeBroadcast(stats), groupCol)
      .withColumn("z_milli",
        when(col("__n") >= 2 && variance > 0,
          floor(lit(1000) * ((x.cast("double") - mean) / sqrt(variance)))
            .cast("long")))
      .drop("__n", "__s", "__s2")
  }

  /** Per-group Pearson correlation between two integer metrics, in
    * floored milli-units — the metric-redundancy / drift diagnostic
    * (is n_chars just a proxy for token count? did the relationship
    * shift between snapshots?). Same exactness discipline as
    * [[zscorePerGroup]]: ONE partial-aggregated shuffle accumulates the
    * five moments (Σx, Σy, Σxy, Σx², Σy²) in decimal(38,0) — exact, so
    * merge order can't perturb them — and r is one double expression
    * over those integers, identical on any engine. Never the built-in
    * `corr`, whose per-partition float merges are order-dependent.
    * Groups with n < 2 or zero variance on either side emit NULL. */
  def corrPerGroup(df: DataFrame, groupCol: String, xCol: Column,
      yCol: Column): DataFrame = {
    val xd = xCol.cast("decimal(38,0)")
    val yd = yCol.cast("decimal(38,0)")
    val stats = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("__n"),
      sum(xd).as("__sx"), sum(yd).as("__sy"),
      sum(xd * yd).as("__sxy"), sum(xd * xd).as("__sx2"),
      sum(yd * yd).as("__sy2"))
    val n = col("__n").cast("double")
    val sx = col("__sx").cast("double"); val sy = col("__sy").cast("double")
    val cov = col("__sxy").cast("double") - sx * sy / n
    val vx = col("__sx2").cast("double") - sx * sx / n
    val vy = col("__sy2").cast("double") - sy * sy / n
    stats.select(col(groupCol), col("__n").as("n_rows"),
      when(col("__n") >= 2 && vx > 0 && vy > 0,
        floor(lit(1000) * cov / sqrt(vx * vy)).cast("long"))
        .as("corr_milli"))
  }

  /** Robust per-group outlier scoring — the MAD (median absolute
    * deviation) twin of [[zscorePerGroup]]: z = 0.6745·(x − med)/MAD in
    * integer milli-units. Mean/stddev z-scores are dragged by the very
    * outliers they hunt; the median/MAD pair is unmoved by anything
    * outside the 50th percentile, which is what you want gating a
    * heavy-tailed corpus (doc lengths are). Exact interpolated
    * percentiles (Spark `percentile` ≡ DuckDB `quantile_cont`, the
    * parity a4 pins); two bounded aggregates + two broadcast joins, the
    * corpus never shuffles. NULL where MAD = 0 (a degenerate constant
    * group has no scale). */
  def madZscorePerGroup(df: DataFrame, groupCol: String,
      metricCol: String): DataFrame = {
    // cut (size-gated): withMed is referenced twice (the MAD aggregate
    // and the final score join), and each reference re-evaluates the
    // per-group median — a full extra input pass. Cutting the
    // group-sized median table pins the input at the 3-pass minimum the
    // two dependent percentiles require (median → MAD → score).
    val med = ScaleHints.cutIfRescanCostly(df.groupBy(col(groupCol))
      .agg(expr(s"percentile($metricCol, 0.5)").as("__med")))
    val withMed = df.join(ScaleHints.maybeBroadcast(med), groupCol)
    val mad = withMed.groupBy(col(groupCol))
      .agg(expr(s"percentile(abs($metricCol - __med), 0.5)").as("__mad"))
    withMed.join(ScaleHints.maybeBroadcast(mad), groupCol)
      .withColumn("rz_milli",
        when(col("__mad") > 0,
          floor(lit(1000.0) * lit(0.6745) *
            (col(metricCol).cast("double") - col("__med")) / col("__mad"))
            .cast("long")))
      .drop("__med", "__mad")
  }

  /** Count-min-sketch dimensions for (eps, confidence): width w =
    * ceil(2/eps) buckets per row, depth d = ceil(log2(1/(1−confidence)))
    * hash rows (Cormode & Muthukrishnan 2005). d ≤ 8 and w ≤ 65536
    * because each row's bucket is carved from a 4-hex-digit (16-bit)
    * slice of one md5 — see [[cmsCounters]]. */
  private[ops] def cmsDims(eps: Double, confidence: Double): (Int, Int) = {
    val w = math.ceil(2.0 / eps).toInt
    val d = math.ceil(math.log(1.0 / (1.0 - confidence)) / math.log(2.0)).toInt
    require(w <= 65536, s"eps=$eps needs width $w > 2^16; raise eps")
    require(d >= 1 && d <= 8, s"confidence=$confidence needs depth $d > 8")
    (w, d)
  }

  // Bucket addressing: item i's bucket in row r is md5 hex digits
  // [1+4r, 4+4r) mod w — d independent 16-bit slices of ONE md5 (md5
  // bits are pairwise-uncorrelated far beyond what a sketch bound
  // needs), and every engine with an md5() can replay the addressing
  // exactly — the property that makes the sketch oracle-checkable,
  // unlike an opaque serialized sketch blob. The addressing lives in
  // graft.expr.SketchRuntime.cmsBuckets (one JVM pass per occurrence);
  // the SQL spelling `conv(substring(md5(item), 1+4r, 4), 16, 10) % w`
  // is its bit-exact oracle twin.

  /** The count-min COUNTER TABLE of a token stream: (i, bucket, cnt),
    * at most d·w rows regardless of corpus size. This IS the sketch —
    * kept as data, not driver bytes: mergeable across corpora by
    * union + re-sum (counter addition commutes), persistable as a tiny
    * parquet, incrementable by adding a delta's counters. One map pass
    * over occurrences (d rows each) into a partial-aggregated shuffle
    * whose key space is bounded by d·w — the full token stream is never
    * shuffled BY TOKEN.
    *
    * NULL-item contract: NULL items contribute NO counters (see the
    * filter below), while the documented hex oracle twin
    * `conv(substring(md5(item), 1+4i, 4), 16, 10) % w` emits d
    * (i, NULL)-bucket rows for each NULL — an oracle replay over a
    * stream containing NULLs must therefore add `WHERE item IS NOT
    * NULL` to stay bit-exact. The declared corpora satisfy the
    * precondition structurally (tokens come from splitting non-null
    * text, and their oracle SQL already drops empty tokens). */
  def cmsCounters(occurrences: DataFrame, tokCol: String,
      eps: Double = 1e-4, confidence: Double = 0.99): DataFrame = {
    val (w, d) = cmsDims(eps, confidence)
    occurrences
      // NULL items contribute no counters: lookups hash a concrete item,
      // so a NULL-keyed counter row could never be consulted — the old
      // hex spelling emitted d dead (i, NULL)-bucket rows for them; the
      // explicit filter makes the divergence deliberate instead of an
      // accident of the kernel's null-propagation
      .filter(col(tokCol).isNotNull)
      // one JVM kernel per occurrence (md5 + d 16-bit slices) — the hex
      // spelling materialized the 32-char hash string and ran d string
      // conversions per token; CmsBucketsExpr is its bit-exact twin on
      // every non-null item
      .select(posexplode(
          graft.expr.sketchFunctions.cms_buckets(col(tokCol), w, d))
        .as(Seq("i", "bucket")))
      .groupBy("i", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Heavy hitters by count-min sketch: the top-k most frequent tokens
    * without ever shuffling the full token stream by token. Two linear
    * passes: (1) the [[cmsCounters]] aggregate — per-occurrence bucket
    * rows partially aggregated map-side onto a key space bounded by d·w,
    * never by vocabulary; (2) a hash-deterministic occurrence sample
    * proposes candidate tokens (anything frequent enough to matter
    * appears in a 10000·f-per-myriad sample with overwhelming
    * probability), each candidate's estimate read back as
    * min over d of its counter rows — a k·d-row join against the bounded
    * counter table. The exact twin — a full groupBy(token) — shuffles
    * every distinct token; this shuffles d·w counters plus the sampled
    * candidates.
    *
    * CMS guarantees: estimate ≥ true count always, ≤ true + eps·N with
    * probability `confidence` (pinned in MiscOpsSpec). Counter addition
    * commutes, the md5 addressing is engine-independent, so the output
    * is deterministic AND the whole pipeline — counters, sample,
    * min-read, top-k — replays as plain SQL in the DuckDB oracle. Size
    * `samplePerMyriad` to the scale: the candidate set must catch tokens
    * with count ≥ the k-th frequency, so sampleRate · kthCount ≫
    * minSampleCount — at 100 TB even 1-per-myriad leaves thousands of
    * sample hits per real heavy hitter.
    *
    * Output: (tok, est_count), top-k by (est desc, tok asc). */
  /** (__id, __pos, tok) token occurrences — the input stream of both
    * the counter aggregate and the candidate sample. */
  def tokenOccurrences(df: DataFrame, idCol: Column,
      textCol: Column): DataFrame =
    df.select(idCol.as("__id"),
      posexplode(split(trim(textCol), "\\s+")).as(Seq("__pos", "tok")))
      .filter(length(col("tok")) > 0)

  /** Merge counter tables (e.g. per-corpus-slice sketches built at
    * different times): counter addition commutes, so union + re-sum IS
    * the merged sketch — byte-identical to sketching the union. */
  def cmsMerge(counterTables: Seq[DataFrame]): DataFrame =
    counterTables.reduce(_.unionByName(_))
      .groupBy("i", "bucket").agg(sum("cnt").as("cnt"))

  /** Heavy-hitter read-back against an EXISTING counter table — the
    * probe half of the sketch lifecycle (build/merge once, query
    * cheaply). `occ` supplies the candidate sample (usually the same
    * stream the counters were built from, or just the fresh slice when
    * only new tokens can newly qualify). */
  def heavyHittersFromCounters(counters: DataFrame, occ: DataFrame,
      k: Int, eps: Double = 1e-4, confidence: Double = 0.99,
      samplePerMyriad: Int = 1000, minSampleCount: Int = 2): DataFrame = {
    val (w, d) = cmsDims(eps, confidence)
    val cand = occ
      .filter(Sampling.hashBucket(
        concat_ws(":", col("__id"), col("__pos"), col("tok")), 10000)
        < samplePerMyriad)
      .groupBy("tok").agg(count(lit(1)).as("__sample_n"))
      .filter(col("__sample_n") >= minSampleCount)
    cand
      .select(col("tok"), posexplode(
          graft.expr.sketchFunctions.cms_buckets(col("tok"), w, d))
        .as(Seq("i", "bucket")))
      // counters is HARD-bounded at d·w ≤ 8·65536 rows (~12 MB) no
      // matter the corpus — always broadcastable, so the candidate side
      // never shuffles for the read-back. LEFT join + coalesce(0): a
      // probed token absent from the counters' build stream (the doc
      // invites probing with a different occ) has empty buckets whose
      // correct CMS reading is 0 — an inner join would either drop it or
      // min() over a surviving subset and inflate the estimate.
      .join(broadcast(counters), Seq("i", "bucket"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .groupBy("tok").agg(min("cnt").as("est_count"))
      .orderBy(col("est_count").desc, col("tok").asc)
      .limit(k)
      .select("tok", "est_count")
  }

  def heavyHittersCms(df: DataFrame, idCol: Column, textCol: Column,
      k: Int, eps: Double = 1e-4, confidence: Double = 0.99,
      samplePerMyriad: Int = 1000, minSampleCount: Int = 2): DataFrame = {
    // Deliberately NOT persisted: tokenization is a cheap projection,
    // and caching the exploded stream costs more than computing it
    // twice (measured 1.7 s cached vs 1.1 s recomputed at sf0.1). The
    // thing worth persisting across probes is the d·w-bounded COUNTER
    // table — the documented sketch lifecycle — never the occurrence
    // stream.
    val occ = tokenOccurrences(df, idCol, textCol)
    heavyHittersFromCounters(cmsCounters(occ, "tok", eps, confidence), occ,
      k, eps, confidence, samplePerMyriad, minSampleCount)
  }

  /** KMV (k-minimum-values) distinct-count sketch, one output column
    * per input column (`adc_<col>`) on a single row — the
    * [[heavyHittersCms]] philosophy applied to COUNT DISTINCT: the
    * sketch state is k 60-bit md5 hash values, so the estimate —
    * (k−1) · 2⁶⁰ / k-th-smallest-hash (Bar-Yossef et al. 2002), exact
    * below k — is engine-independent and the whole pipeline replays as
    * plain SQL, unlike an opaque HLL register blob. Determinism: md5 is
    * seedless; min-k of a set does not depend on row order.
    *
    * Scale shape: a bounded TreeSet keeps the k smallest DISTINCT
    * hashes per partition (one pass, O(k) memory — the honest sketch
    * contract), so the merge shuffles at most k·partitions values, never
    * the distinct universe. mapPartitions is justified: maintaining
    * bounded sketch state across rows has no Column-function form.
    * Estimator error ~ 1/√(k−2) (≈6% at k = 256); exact when the true
    * distinct count is below k. */
  /** The ≤ k smallest DISTINCT 60-bit md5 hashes of one column — the
    * KMV sketch AS DATA (column `h`): persistable as a tiny table and
    * mergeable with [[kmvMerge]]. Bounded per-partition TreeSet keeps
    * the one-pass O(k)-state contract; the merge shuffles at most
    * k·partitions values. */
  def kmvSketch(df: DataFrame, c: String, k: Int = 256): DataFrame = {
    import scala.jdk.CollectionConverters._
    val enc = org.apache.spark.sql.Encoders.scalaLong
    val h60 = conv(substring(md5(col(c).cast("string")), 1, 15), 16, 10)
      .cast("long")
    df.where(col(c).isNotNull).select(h60.as("h"))
      .as[Long](enc)
      .mapPartitions { it =>
        val ts = new java.util.TreeSet[java.lang.Long]()
        it.foreach { h => ts.add(h); if (ts.size > k) ts.pollLast() }
        ts.iterator.asScala.map(Long2long)
      }(enc)
      .toDF("h").distinct().orderBy(col("h")).limit(k)
  }

  /** Merge KMV sketches (e.g. per-corpus-slice, built at different
    * times): min-k of a union = min-k over the unioned min-k sets, so
    * union + distinct + re-cut IS the merged sketch — byte-identical to
    * sketching the union. */
  def kmvMerge(sketches: Seq[DataFrame], k: Int = 256): DataFrame =
    sketches.reduce(_.unionByName(_)).distinct().orderBy(col("h")).limit(k)

  /** The distinct-count estimate of one sketch, as a 1-row frame with
    * the given column name: exact count when below k, else
    * (k−1)·2⁶⁰ / k-th-smallest (Bar-Yossef et al. 2002). */
  def kmvEstimate(sketch: DataFrame, outCol: String, k: Int = 256): DataFrame = {
    val twoPow60 = 1.152921504606846976e18 // 2^60, exactly representable
    sketch.agg(count(lit(1)).as("__n"), max(col("h")).as("__hmax"))
      .select(
        when(col("__n") < k, col("__n"))
          .otherwise(floor(lit((k - 1).toDouble) * lit(twoPow60) /
            col("__hmax").cast("double")).cast("long"))
          .as(outCol))
  }

  /** Per-GROUP KMV sketch: the k smallest distinct 60-bit hashes of `c`
    * within each group — the grouped twin of [[kmvSketch]]. One shuffle
    * on (group, h) for the distinct, then a WindowGroupLimit-pruned
    * row_number ≤ k per group: no group ever materializes more than its
    * k survivors past the partial level, so a hot group costs the same
    * as a cold one. Merge across shards/batches = union + distinct +
    * re-cut per group (min-k of a union), same as the global sketch. */
  def kmvSketchPerGroup(df: DataFrame, groupCol: String, c: String,
      k: Int = 256): DataFrame = {
    val h60 = conv(substring(md5(col(c).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val w = Window.partitionBy(groupCol).orderBy("h")
    df.where(col(c).isNotNull)
      .select(col(groupCol), h60.as("h")).distinct()
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
      .select(col(groupCol), col("h"))
  }

  /** Per-group distinct-count estimates from a [[kmvSketchPerGroup]]
    * sketch: exact count below k, else (k−1)·2⁶⁰ / k-th-smallest —
    * identical arithmetic to [[kmvEstimate]], per group. */
  def kmvEstimatePerGroup(sketch: DataFrame, groupCol: String,
      outCol: String, k: Int = 256): DataFrame = {
    val twoPow60 = 1.152921504606846976e18
    sketch.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"), max(col("h")).as("__hmax"))
      .select(col(groupCol),
        when(col("__n") < k, col("__n"))
          .otherwise(floor(lit((k - 1).toDouble) * lit(twoPow60) /
            col("__hmax").cast("double")).cast("long"))
          .as(outCol))
  }

  def approxDistinctKmv(df: DataFrame, cols: Seq[String],
      k: Int = 256): DataFrame =
    cols.map(c => kmvEstimate(kmvSketch(df, c, k), s"adc_$c", k))
      .reduce(_.crossJoin(_)) // 1-row frames

  /** Order-independent dataset content digest — the "did anything
    * change" primitive that decides whether downstream caches (saved
    * indexes, materialized rollups, published snapshots) need a rebuild
    * without diffing a single row: each row hashes to a 60-bit integer
    * (md5 prefix — content-derived, row-order-free), the digest is their
    * SUM in exact decimal reduced mod 10^18 (addition commutes, so
    * partition order and merge order never matter), alongside the row
    * count (sums collide on swapped multisets-with-equal-sum; count
    * narrows it, and 60-bit content hashes make engineered collisions a
    * non-concern for cache keying). One aggregate over the scan. */
  def datasetDigest(df: DataFrame, cols: Seq[String]): DataFrame = {
    val rowHash = conv(substring(md5(concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0002"))): _*)),
      1, 15), 16, 10).cast("long")
    df.agg(count(lit(1)).as("n_rows"),
      (sum(rowHash.cast("decimal(38,0)")) % lit(1000000000000000000L))
        .cast("long").as("digest"))
  }

  /** Join-key skew report — the "does this key need salting?" diagnostic
    * that decides between [[SkewJoin.saltedEquiJoin]] and a plain join:
    * per-key counts reduce to one row of corpus-level skew facts, all
    * integer-exact. `skew_ratio_milli` = max·n_keys·1000 div n_rows is
    * the hottest key's load relative to perfect balance (1000 = uniform;
    * AQE's skew threshold thinks in the same ratio); `top_share_milli`
    * is the mass of the top `k` keys. Two bounded aggregates: the
    * per-key count (one shuffle on the key — the same shuffle the
    * candidate join would pay, so profiling here is never wasted work)
    * and a single-row rollup. */
  def keySkew(df: DataFrame, keyCol: String, k: Int = 5): DataFrame = {
    // MATERIALIZED (eager): counts feeds both the top-k probe and the
    // rollup — left lazy, the second reference re-runs the per-key count
    // over the whole input (one extra full scan + shuffle). Key-
    // cardinality-sized, the cheap side of the trade at any corpus size.
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val topk = counts.orderBy(col("n").desc, col(keyCol).asc).limit(k)
      .agg(sum("n").as("__top_n"))
    counts.agg(count(lit(1)).as("n_keys"), sum("n").as("n_rows"),
        max("n").as("max_key_rows"))
      .crossJoin(broadcast(topk))
      .select(col("n_keys").cast("long").as("n_keys"),
        col("n_rows").cast("long").as("n_rows"),
        col("max_key_rows").cast("long").as("max_key_rows"),
        expr("max_key_rows * n_keys * 1000L div n_rows")
          .as("skew_ratio_milli"),
        expr("__top_n * 1000L div n_rows").as("top_share_milli"))
  }

  /** Exact equi-width histogram of an integer column over [lo, hi):
    * bucket 0 catches underflow, `nBins`+1 overflow (the Postgres
    * width_bucket convention), interior bucket of v is
    * 1 + (v−lo)·nBins div (hi−lo) — all integer arithmetic, so both
    * engines bucket identically (a float bin width would round bucket
    * EDGES differently per engine). One hash aggregate on the bucket id
    * (≤ nBins+2 groups, map-side partials); empty buckets are absent.
    * Output: (bin, n, v_min, v_max) — per-bucket min/max double as the
    * footer-stats audit. Nulls are dropped; count them with [[profile]].
    */
  def histogramInt(df: DataFrame, colName: String, lo: Long, hi: Long,
      nBins: Int): DataFrame = {
    require(hi > lo && nBins >= 1, "need hi > lo and nBins >= 1")
    val v = col(colName).cast("long")
    val bin = when(v < lo, lit(0))
      .when(v >= hi, lit(nBins + 1))
      .otherwise(expr(s"CAST(1 + (CAST($colName AS BIGINT) - ${lo}L) " +
        s"* ${nBins}L div (${hi}L - ${lo}L) AS INT)"))
    df.filter(v.isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"), min(v).as("v_min"), max(v).as("v_max"))
  }

  /** Mergeable approximate per-group quantiles — the fixed-memory twin
    * of the exact `percentile` path (a4): Spark's `percentile_approx`
    * (Greenwald–Khanna summaries) keeps O(accuracy·log n) state per
    * group regardless of group size and merges partials associatively,
    * where the exact percentile materializes every value per group. At
    * 100 TB the exact form is only affordable on bounded groups; this
    * one is safe on any skew. Rank error ≤ n/accuracy (pinned in spec).
    * Output long-format: (group, prob_pct, q_approx) — one row per
    * group × probability. */
  def approxQuantilesPerGroup(df: DataFrame, groupCol: String,
      metricCol: String, probs: Seq[Double],
      accuracy: Int = 10000): DataFrame = {
    val probsSql = probs.mkString("array(", ", ", ")")
    df.groupBy(col(groupCol))
      .agg(expr(s"percentile_approx($metricCol, $probsSql, $accuracy)")
        .as("__qs"))
      .select(col(groupCol), posexplode(col("__qs")).as(Seq("__i", "q_approx")))
      .withColumn("prob_pct",
        element_at(lit(probs.map(p => math.round(p * 100).toInt).toArray),
          col("__i").cast("int") + 1))
      .select(col(groupCol), col("prob_pct"), col("q_approx").cast("long"))
  }

  /** Replayable approximate per-group quantiles by DETERMINISTIC
    * sampling — the rank-error twin of [[histQuantilesPerGroup]]'s
    * value-error contract, and the honest replacement for
    * `percentile_approx` when the answer must be engine-checkable: GK
    * summaries promise rank error but their state is engine-private;
    * here the "sketch" is a hash-deterministic row sample (keep a row
    * iff md5(key) mod 10000 < samplePerMyriad — no RNG state, the same
    * device as [[heavyHittersFromCounters]]'s candidate sample), and
    * the estimate is the EXACT empirical lower quantile of the sample:
    * the smallest sampled value whose cumulative count reaches rank
    * ⌈p·n_sample⌉, all-integer arithmetic. Every step — the sample
    * membership, the cumulative window, the rank lookup — replays as
    * plain SQL in any engine with md5(), so the result hash-matches
    * across engines, which engine-private GK state never can.
    *
    * Scale: state is bounded by the sample rate the caller picks (rank
    * error ~ 1/√(rate·n) per group), the per-(group, value) aggregate
    * is map-side combined, and the window runs per group over sampled
    * DISTINCT values only. Output: (group, prob_pct, q_sample). */
  def sampleQuantilesPerGroup(df: DataFrame, groupCol: String,
      metricCol: String, keyCol: String, probPcts: Seq[Int],
      samplePerMyriad: Int): DataFrame = {
    require(samplePerMyriad >= 1 && samplePerMyriad <= 10000)
    val s = df.filter(col(metricCol).isNotNull)
      .filter(Sampling.hashBucket(col(keyCol).cast("string"), 10000)
        < samplePerMyriad)
      .select(col(groupCol), col(metricCol).cast("long").as("__v"))
    val vc = s.groupBy(col(groupCol), col("__v"))
      .agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(groupCol).orderBy("__v")
    val cum = vc.withColumn("__cum", sum(col("__cnt")).over(w))
    val n = s.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val rk = n.select(col(groupCol),
        explode(lit(probPcts.toArray)).as("prob_pct"), col("__n"))
      .withColumn("__rnk", expr("(__n * prob_pct + 99) div 100"))
    rk.join(cum, Seq(groupCol))
      .filter(col("__cum") >= col("__rnk"))
      .groupBy(col(groupCol), col("prob_pct"))
      .agg(min("__v").as("__q"))
      .select(col(groupCol), col("prob_pct"),
        col("__q").cast("long").as("q_sample"))
  }

  /** The mergeable SKETCH half of the deterministic quantile twin: per
    * (group, fixed-width value bin) counts — one map-side-combined
    * shuffle whose key cardinality is bounded by groups × bins, never by
    * rows. Merging shards/batches is `unionByName` + re-sum (proven
    * merge == full in ProfileSpec), the property GK summaries buy with
    * engine-private state; here the state is a plain table, so the
    * estimate is engine-exact and the oracle replays it. */
  def histQuantileSketch(df: DataFrame, groupCol: String, metricCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth >= 1, "binWidth must be >= 1")
    df.filter(col(metricCol).isNotNull)
      .groupBy(col(groupCol),
        expr(s"CAST($metricCol AS BIGINT) div ${binWidth}L").as("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Estimate per-group percentiles from a [[histQuantileSketch]]: for
    * each probability p, the smallest bin whose cumulative count reaches
    * rank ⌈p·n⌉ (integer arithmetic: (n·pct + 99) div 100), reported as
    * the bin's lower bound. Deterministic, order-free, error ≤ binWidth
    * by construction — the honest contract at any scale, vs
    * percentile_approx whose GK state is engine-specific (rows-only).
    * Output: (group, prob_pct, q_hist). */
  def histQuantilesFromSketch(sketch: DataFrame, groupCol: String,
      probPcts: Seq[Int], binWidth: Long): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy("bin")
    val cum = sketch.withColumn("cum", sum(col("cnt")).over(w))
    val n = sketch.groupBy(col(groupCol)).agg(sum("cnt").as("n"))
    val rk = n.select(col(groupCol), explode(lit(probPcts.toArray)).as("prob_pct"),
        col("n"))
      .withColumn("rnk", expr("(n * prob_pct + 99) div 100"))
    rk.join(cum, Seq(groupCol))
      .filter(col("cum") >= col("rnk"))
      .groupBy(col(groupCol), col("prob_pct"))
      .agg(min("bin").as("__bin"))
      .select(col(groupCol), col("prob_pct"),
        (col("__bin") * binWidth).cast("long").as("q_hist"))
  }

  /** Build-and-estimate convenience: [[histQuantileSketch]] →
    * [[histQuantilesFromSketch]]. */
  def histQuantilesPerGroup(df: DataFrame, groupCol: String,
      metricCol: String, probPcts: Seq[Int], binWidth: Long): DataFrame =
    histQuantilesFromSketch(
      histQuantileSketch(df, groupCol, metricCol, binWidth),
      groupCol, probPcts, binWidth)

  /** Population Stability Index per group — the distribution-level
    * drift monitor ([[profileDrift]] watches schema-level stats; PSI
    * watches the VALUE distribution): PSI = Σ_bins (p−q)·ln(p/q)
    * between the current and prior snapshots' [[histQuantileSketch]]
    * histograms, with add-one (Laplace) smoothing so bins present on
    * one side only contribute finitely. Convention: PSI < 0.1 stable,
    * 0.1–0.2 moderate, > 0.2 action (`alertMicro` defaults to the 0.2
    * rule in micro-units).
    *
    * Engine-exact: p and q derive from exact integer counts through an
    * identical double expression tree on both engines (ln is the lone
    * libm call — same isolation as BM25's idf), each bin term is
    * floored to micro-units BEFORE the per-group integer sum, so the
    * result is merge-order-free and the oracle replays it bit-for-bit.
    * Cost: two bounded-cardinality sketch shuffles + one sketch-sized
    * join — the corpora are scanned once each, never joined row-level.
    */
  def psiDrift(cur: DataFrame, prior: DataFrame, groupCol: String,
      metricCol: String, binWidth: Long,
      alertMicro: Long = 200000L): DataFrame =
    psiFromSketches(
      histQuantileSketch(cur, groupCol, metricCol, binWidth),
      histQuantileSketch(prior, groupCol, metricCol, binWidth),
      groupCol, alertMicro)

  /** PSI from two prebuilt [[histQuantileSketch]] tables — the entry
    * point when the snapshots arrive as merged shard sketches (the
    * sketch is a plain count table, so merge = union + re-sum and
    * merged == full bit-for-bit; ProfileSpec pins it). */
  def psiFromSketches(curSketch: DataFrame, priorSketch: DataFrame,
      groupCol: String, alertMicro: Long = 200000L): DataFrame = {
    val c = curSketch.withColumnRenamed("cnt", "cnt_c")
    val p = priorSketch.withColumnRenamed("cnt", "cnt_p")
    val joined = c.join(p, Seq(groupCol, "bin"), "full_outer")
      .select(col(groupCol), col("bin"),
        coalesce(col("cnt_c"), lit(0L)).as("cnt_c"),
        coalesce(col("cnt_p"), lit(0L)).as("cnt_p"))
    val tot = joined.groupBy(col(groupCol)).agg(
      sum("cnt_c").cast("long").as("n_c"),
      sum("cnt_p").cast("long").as("n_p"),
      count(lit(1)).as("n_bins"))
    joined.join(ScaleHints.maybeBroadcast(tot), Seq(groupCol))
      .withColumn("__p", (col("cnt_c") + 1).cast("double") /
        (col("n_c") + col("n_bins")).cast("double"))
      .withColumn("__q", (col("cnt_p") + 1).cast("double") /
        (col("n_p") + col("n_bins")).cast("double"))
      .withColumn("__term_micro",
        floor(lit(1e6) * (col("__p") - col("__q")) *
          log(col("__p") / col("__q"))).cast("long"))
      .groupBy(col(groupCol), col("n_bins"))
      .agg(sum("__term_micro").cast("long").as("psi_micro"))
      .withColumn("drift_flag", (col("psi_micro") >= alertMicro).cast("int"))
      .select(col(groupCol), col("n_bins"), col("psi_micro"),
        col("drift_flag"))
  }
}
