package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering, the
  * mechanism behind Delta/Iceberg `OPTIMIZE ZORDER BY` (Morton 1966;
  * the Delta implementation is the public reference). Parquet skipping
  * prunes files by min/max footer stats, but a single-column sort gives
  * tight bounds on ONE column only — every other predicate column has
  * near-full-range stats in every file. Interleaving the bits of two
  * (or more) columns orders rows along a space-filling curve, so each
  * written file covers a small HYPERCUBE: min/max stays tight on ALL
  * interleaved dimensions at once and multi-predicate scans prune.
  *
  * The key is a pure per-row expression (shift/mask/or over the low
  * `bits` bits of each dimension — whole-stage-codegen'd, no shuffle,
  * engine-portable: the oracle computes the identical integer). Callers
  * must pre-map dimensions onto a bounded non-negative integer range
  * (truncate, bucket, or rank first: range-RANKING the dims before
  * interleaving is what production Z-ordering does so skewed raw values
  * still spread across the curve).
  *
  * [[zorderWrite]] is the production write path: `repartitionByRange`
  * on the key (sampled boundaries — one shuffle), sort WITHIN each
  * partition, one file per partition. Boundary sampling makes file
  * assignment nondeterministic at the margin, which is why the
  * driver-checked query buckets by exact `ntile` instead.
  */
object Layout {

  /** 2-D Morton key interleaving the low `bits` bits of `x` (even bit
    * positions) and `y` (odd positions). Inputs must be non-negative;
    * values above 2^bits−1 are truncated (mask your dims first). */
  def zorderKey2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** N-dimensional Morton key: round-robin bit interleave of the low
    * `bits` bits of each dimension (dim 0 gets positions 0, n, 2n, …).
    * Total key width = dims.length · bits, which must fit a signed long
    * (≤ 62). Same preconditions as [[zorderKey2]]. */
  def zorderKeyN(dims: Seq[Column], bits: Int = 16): Column = {
    require(dims.nonEmpty, "need at least one dimension")
    require(bits >= 1 && dims.length * bits <= 62,
      s"key width ${dims.length * bits} exceeds a signed long")
    val n = dims.length
    (for { i <- 0 until bits; (d, j) <- dims.zipWithIndex } yield
      shiftleft(shiftright(d, i).bitwiseAND(lit(1)), i * n + j))
      .reduce(_.bitwiseOR(_))
  }

  /** `ntile(n)` over the GLOBAL order (`keyCol` asc, `tieCol` asc)
    * without a single-partition window — the r17 scale fix for the
    * Z-order layout audit, whose `Window.orderBy(zkey, …)` moved the
    * whole fact table to ONE task (WindowExec's "No Partition Defined"
    * path, the one unbounded global window in the declared query set).
    *
    * Decomposition: 0-based global rank = (rows with a smaller key) +
    * (rank within this key by `tieCol`) − 1. The per-key histogram is
    * grouped-aggregated (partial-agg friendly) and must be BOUNDED
    * cardinality — the caller's contract, met by a masked Morton key
    * (bits=8 ⇒ ≤ 65 536 cells) — so its cumulative-offset window is a
    * bounded small-table job and the offsets broadcast. The per-row
    * window partitions by `keyCol`: fact-scale data never
    * single-partitions. `tieCol` must be unique within a key group.
    * `outCol` then replays ntile's exact bucket arithmetic off the
    * global rank (q = N div n, r = N mod n; first r buckets get q+1
    * rows; `greatest(q, 1)` keeps the dead else-branch division defined
    * when N < n) — row-identical to `ntile(n).over(orderBy(key, tie))`,
    * pinned by LayoutSpec on a skewed sample. */
  def globalNtile(df: DataFrame, keyCol: Column, tieCol: Column,
      n: Int, outCol: String): DataFrame = {
    require(n >= 1, "n must be >= 1")
    import org.apache.spark.sql.expressions.Window
    // Size-gated cutover, the [[PageRank.bigGraphNodes]] discipline: the
    // decomposed form costs a SECOND pass over the input (the histogram)
    // plus two more exchanges, and at every size this sandbox can
    // measure the one-task sort of a narrow frame wins (r17 A/B,
    // sweeps-median window vs decomposed: sf0.1 1.0 s vs 1.5; sf1 2.5
    // vs 4.8; sf10 — a ~3 GB / 100M-row one-task sort — 27 vs 87, with
    // the warm third sweeps at 14 vs 21). Spark's radix-sorting
    // UnsafeExternalSorter makes a single-task sort CPU-cheap; what
    // kills it at corpus scale is one task's MEMORY: past a few GB the
    // sort spills and the whole fact table serializes through one
    // core's disk queue, and at 100 TB the frame does not fit one
    // machine at all. The 2 GiB default keeps every measured regime on
    // the fast path and cuts over only where the one-task form stops
    // being physically sane; it is a conf, not a constant, because the
    // right value is executor-memory-shaped.
    // The gate reads the OPTIMIZER's size estimate of the frame entering
    // the window (plan stats: file bytes for scans scaled by pruning;
    // checkpoint-fed frames estimate Long.MaxValue and land on the
    // decomposed side — the safe direction).
    val cutover = df.sparkSession.conf
      .getOption("spark.graft.globalNtileSingleTaskMaxBytes")
      .map(_.toLong).getOrElse(2048L * 1024 * 1024)
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(cutover))
      return df.withColumn(outCol,
        ntile(n).over(Window.orderBy(keyCol, tieCol)))
    val hist = ScaleHints.cutIfRescanCostly(
      df.groupBy(keyCol.as("__gk")).agg(count(lit(1)).as("__n")))
    val wz = Window.orderBy(col("__gk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = hist.select(col("__gk"),
      (sum(col("__n")).over(wz) - col("__n")).as("__off"))
    val tot = hist.agg(sum(col("__n")).as("__N"))
    val wk = Window.partitionBy(keyCol).orderBy(tieCol)
    df.join(broadcast(offs), keyCol === col("__gk"))
      .crossJoin(broadcast(tot))
      .withColumn("__i", col("__off") + row_number().over(wk) - 1)
      .withColumn(outCol, expr(
        s"""cast(if(__i < (__N % $n) * (__N div $n + 1),
           |        __i div (__N div $n + 1) + 1,
           |        __N % $n + (__i - (__N % $n) * (__N div $n + 1))
           |          div greatest(__N div $n, 1L) + 1) as int)""".stripMargin))
      .drop("__gk", "__n", "__off", "__N", "__i")
  }

  /** Write-side clustering: range-repartition on the Morton key into
    * `nFiles` partitions and sort within each — the OPTIMIZE ZORDER
    * shape (one shuffle; boundaries come from Spark's reservoir sample
    * over the key column). Returns the clustered frame ready for a
    * partition-per-file write. */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String,
      nFiles: Int, bits: Int = 16): DataFrame = {
    val keyed = df.withColumn("__zkey",
      zorderKey2(col(xCol).cast("long"), col(yCol).cast("long"), bits))
    keyed.repartitionByRange(nFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
  }

  /** Hive-style partitioned write: directory-per-value layout
    * (`path/col=v/…`), the coarse-grained complement of Z-ordering —
    * partition directories prune by LISTING (the scan never opens a
    * pruned directory's footers), file stats prune WITHIN a partition.
    * Rows are hash-repartitioned on the partition columns first so each
    * directory gets ONE file instead of one-per-task — at 1000
    * executors an unrepartitioned `partitionBy` writes
    * tasks × partitions small files, the classic small-files explosion.
    * Partition columns must be low-cardinality (lang, date — never a
    * key): each distinct tuple is a directory, and the driver lists
    * them all at planning time. */
  def partitionedWrite(df: DataFrame, path: String,
      partCols: Seq[String]): Unit =
    df.repartition(partCols.map(col): _*)
      .write.partitionBy(partCols: _*)
      .mode("overwrite").parquet(path)

  /** Idempotent partition backfill: rewrite ONLY the partitions present
    * in `df` (dynamic partition overwrite), leaving every other
    * directory byte-untouched — the re-run/repair primitive for a
    * partitioned corpus. Static overwrite mode would TRUNCATE the whole
    * table to the incoming partitions; dynamic mode makes a failed day's
    * re-ingest safe to replay. Same one-file-per-directory repartition
    * discipline as [[partitionedWrite]]. */
  def backfillPartitions(df: DataFrame, path: String,
      partCols: Seq[String]): Unit =
    df.repartition(partCols.map(col): _*)
      .write.partitionBy(partCols: _*)
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(path)

  /** Read a partitioned table with partition-column filters attached —
    * Catalyst turns them into `PartitionFilters` (directory pruning at
    * plan time, visible in `.explain`; LayoutSpec asserts the scan's
    * selected-partition count). */
  def prunedRead(spark: org.apache.spark.sql.SparkSession, path: String,
      filter: Column): DataFrame =
    spark.read.parquet(path).filter(filter)

  /** Small-file compaction planner — the OPTIMIZE/bin-packing pass every
    * table-format maintenance job runs: assign each input file to a
    * target-sized output bin, deterministically, from file METADATA only
    * (no data read).
    *
    * Packing rule: within each partition key, files sort (bytes desc,
    * name) and fill bins by running total — next-fit on the sorted
    * order, the classic 2-approximation that needs ONE window instead
    * of a sequential best-fit state machine. bin = (cumsum − bytes) div
    * target, so a file starts a new bin exactly when the running total
    * before it has crossed a target boundary; oversized files (≥
    * target) land alone in their own bin by the same arithmetic.
    *
    * Scale shape: the input is file metadata — rows = files, grouped by
    * the partition key, so the window never sees more rows per key than
    * one table partition holds (listing-sized, not data-sized); the
    * plan is computable on a single coordinator-scale table even for a
    * 100 TB lake. Output: one row per planned output file —
    * (key, bin, n_files, bin_bytes) — feed it to a rewrite job. */
  def compactionPlan(files: DataFrame, keyCol: String, nameCol: String,
      bytesCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes >= 1)
    // explicit ROWS frame: the default RANGE frame would give rows tied
    // on (bytes, name) — e.g. a caller unioning two listings of the
    // same file — ONE shared cumulative total and both a wrong bin
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col(bytesCol).desc, col(nameCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    files
      .withColumn("__cum", sum(col(bytesCol)).over(w))
      .withColumn("bin",
        expr(s"(__cum - $bytesCol) div ${targetBytes}L").cast("long"))
      .groupBy(col(keyCol), col("bin"))
      .agg(count(lit(1)).as("n_files"),
        sum(col(bytesCol)).cast("long").as("bin_bytes"))
  }
}
