package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic sampling, domain mixing, and shuffle-sharding for
  * training-data preparation (builder-prompt extension family; the
  * reference pipeline stops at publish — these are the steps a corpus
  * takes between publish and the training job).
  *
  * Everything keys off a content hash, never an RNG: the same input
  * always produces the same sample/mix/shard, any subset of the data can
  * be re-processed independently (no coordination, no seed state), and
  * the oracle can replay the exact decision in SQL. That is the property
  * that matters at 100 TB — a resumable job must not re-roll the dice.
  *
  * All decisions are narrow per-row expressions (codegen'd, no shuffle);
  * only [[shuffleShards]] shuffles, and only by its shard key.
  */
object Sampling {

  /** Uniform deterministic bucket in [0, mod) from the md5 of a key.
    * 15 hex digits = 60 bits, so the parse never overflows a long and
    * the low-mod remainder is unbiased for any practical `mod`.
    * Cross-engine: DuckDB computes the identical value as
    * `CAST(('0x' || substr(md5(k),1,15)) AS UBIGINT) % mod`; the Spark
    * side computes it in one codegen kernel (Md5Prefix60Expr — the
    * conv(substring(...)) spelling materialized and re-parsed the hex
    * string per row). */
  def hashBucket(key: Column, mod: Int): Column =
    graft.expr.sketchFunctions.md5_prefix60(key) % mod

  /** Per-stratum deterministic Bernoulli sample: keep a row iff its hash
    * bucket (out of 10000) falls under the stratum's per-myriad rate.
    * A stratum absent from `rates` keeps `defaultPerMyriad`. Pure filter —
    * pushes to the scan, no shuffle, no RNG. */
  def stratifiedSample(df: DataFrame, keyCol: Column, strataCol: Column,
      rates: Map[String, Int], defaultPerMyriad: Int): DataFrame = {
    val rate = rates.foldLeft(lit(defaultPerMyriad)) { case (acc, (s, r)) =>
      when(strataCol === s, lit(r)).otherwise(acc)
    }
    df.filter(hashBucket(keyCol, 10000) < rate)
  }

  /** Temperature-balanced source weights, T = 2 (the multilingual-LM
    * mixing recipe — mT5/XLM-R sample sources ∝ p^(1/T) so huge sources
    * stop drowning small ones; T = 2 is the common setting and its
    * p^(1/2) is `sqrt`, the ONE power IEEE defines exactly-rounded, so
    * both engines compute bit-identical weights — a general pow(x, 1/T)
    * is not portable and is deliberately not offered here). Each
    * stratum's sqrt(size) floors to micro-units BEFORE the integer
    * total (no float accumulation), weight_milli = m·1000 div Σm. Two
    * tiny aggregates over the per-stratum sizes; feed the output into
    * [[mixEpochs]] / [[takeTokenBudget]] as the recipe's weight table. */
  def temperatureWeights(df: DataFrame, strataCol: Column,
      sizeExpr: Column): DataFrame = {
    // MATERIALIZED when a re-scan is costly (ScaleHints.cutIfRescanCostly):
    // sizes is strata-sized but feeds both the total and the output
    // projection — left lazy, the second reference re-aggregates the
    // whole corpus (one extra full scan).
    val sizes = ScaleHints.cutIfRescanCostly(
      df.groupBy(strataCol.as("stratum"))
        .agg(sum(sizeExpr).as("n_units"))
        .withColumn("__m",
          floor(lit(1000000.0) * sqrt(col("n_units").cast("double")))
            .cast("long")))
    val total = sizes.agg(sum(col("__m")).as("__tot"))
    sizes.crossJoin(broadcast(total))
      .select(col("stratum"), col("n_units").cast("long").as("n_units"),
        expr("__m * 1000L div __tot").as("weight_milli"))
  }

  /** Domain mixing by fractional epoch weights (the "see high-quality
    * sources 2.5 times" step of a training-mix recipe): every row gets
    * floor(w) copies, plus one more iff its hash bucket lands under the
    * fractional remainder — so a stratum with weight w is replicated
    * w× in expectation and deterministically per row. Output adds an
    * `epoch` column (1..n); rows with n = 0 drop out. Weights must be
    * exact in quarter-myriads (w*10000 integral) so the threshold
    * compare is integer-exact on both engines. */
  def mixEpochs(df: DataFrame, keyCol: Column, strataCol: Column,
      weights: Map[String, Double], defaultWeight: Double): DataFrame = {
    def wholeAndFrac(w: Double): (Int, Int) = {
      val whole = math.floor(w).toInt
      val frac = math.round((w - whole) * 10000).toInt
      require(math.abs((w - whole) * 10000 - frac) < 1e-6,
        s"weight $w is not exact in 1/10000ths")
      (whole, frac)
    }
    val (dw, df0) = wholeAndFrac(defaultWeight)
    val copies = weights.foldLeft(
        lit(dw) + when(hashBucket(keyCol, 10000) < df0, 1).otherwise(0)) {
      case (acc, (s, w)) =>
        val (wh, fr) = wholeAndFrac(w)
        when(strataCol === s,
          lit(wh) + when(hashBucket(keyCol, 10000) < fr, 1).otherwise(0))
          .otherwise(acc)
    }
    df.withColumn("__n", copies)
      .filter(col("__n") > 0)
      .withColumn("epoch", explode(sequence(lit(1), col("__n"))))
      .drop("__n")
      .withColumn("epoch", col("epoch").cast("long"))
  }

  /** Deterministic train/val/test assignment from the key hash: the
    * split is a pure function of the row, so re-runs, backfills, and
    * late-arriving partitions all land in the same split — no leakage
    * between sets across pipeline versions. Thresholds in per-myriad
    * (test first, then val, remainder train). */
  def assignSplit(df: DataFrame, keyCol: Column,
      testPerMyriad: Int, valPerMyriad: Int): DataFrame = {
    val b = hashBucket(keyCol, 10000)
    df.withColumn("split",
      when(b < testPerMyriad, lit("test"))
        .when(b < testPerMyriad + valPerMyriad, lit("val"))
        .otherwise(lit("train")))
  }

  /** Per-row weighted Bernoulli keep: P(keep) = weightPerMyriad / 10000
    * with the decision a pure function of the key hash — the quality-
    * proportional retention step of a curation recipe ("keep fluent docs
    * at 90%, word salad at 10%") where the weight is itself a computed
    * column. Same pushdown-friendly filter shape as
    * [[stratifiedSample]]: no RNG state, no shuffle, re-runnable. */
  def weightedSample(df: DataFrame, keyCol: Column,
      weightPerMyriad: Column): DataFrame =
    df.filter(hashBucket(keyCol, 10000) < weightPerMyriad)

  /** Near-dup-aware split hygiene: re-label every train row that is a
    * near-duplicate of a held-out (test/val) row as 'train_contaminated'
    * so the training set never sees a paraphrase of the eval set. The
    * caller supplies the near-dup pair table — any of the Dedup family
    * (exact groups, n-gram Jaccard, MinHash, embedding cosine) plugs in,
    * so detection cost is the scale-safe candidate path, not this
    * operator. `df` must already carry assignSplit's `split` column.
    *
    * Shuffle shape: held-out keys are a few permille of the corpus and
    * the dirty set is bounded by the pair table, so both joins broadcast
    * at any realistic scale; the full corpus is never shuffled. */
  def decontaminateSplit(df: DataFrame, keyCol: Column,
      pairs: DataFrame, iCol: String, jCol: String): DataFrame = {
    // both orientations from ONE scan of the pair pipeline: the union
    // form re-executed the (expensive) candidate+verify plan per branch
    // (measured at sf1, r13 artifact); explode reads it once
    val edges = pairs.select(explode(array(
        struct(col(iCol).as("__a"), col(jCol).as("__b")),
        struct(col(jCol).as("__a"), col(iCol).as("__b")))).as("__e"))
      .select(col("__e.__a").as("__a"), col("__e.__b").as("__b"))
    val held = df.filter(col("split").isin("test", "val"))
      .select(keyCol.as("__b"))
    val dirty = edges.join(ScaleHints.maybeBroadcast(held), Seq("__b"))
      .select(col("__a")).distinct()
      .withColumn("__dirty", lit(1))
    df.join(ScaleHints.maybeBroadcast(dirty), keyCol === col("__a"), "left")
      .withColumn("split",
        when(col("split") === "train" && col("__dirty") === 1,
          lit("train_contaminated")).otherwise(col("split")))
      .drop("__a", "__dirty")
  }

  /** Exactly-n-per-stratum deterministic sample (the "show me 100 docs
    * from every source" shape): rank rows inside each stratum by their
    * key's md5 and keep the first n — a hash-ordered reservoir that is
    * stable across runs and appends only at the margin. One shuffle on
    * the stratum; rank ties impossible (md5 of a unique key). */
  def samplePerStratum(df: DataFrame, keyCol: Column, strataCol: Column,
      n: Int): DataFrame = {
    val w = Window.partitionBy(strataCol).orderBy(md5(keyCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** Training-sequence packing: documents are (conceptually) concatenated
    * in a deterministic order and cut every `budgetTokens` tokens; each
    * document is labeled with the sequence its FIRST token lands in —
    * the concat-and-cut packing step before a training job, as a running
    * sum. Sharded like [[shuffleShards]] so the order is reproducible and
    * the window never sees more than one shard: one shuffle, per-shard
    * sort, no global coordination. Output adds (shard, start_tok, seq_no). */
  def packSequences(df: DataFrame, keyCol: Column, tokenCol: Column,
      budgetTokens: Int, nShards: Int): DataFrame = {
    val w = Window.partitionBy(col("__shard")).orderBy(col("__h"))
    df.withColumn("__h", md5(keyCol))
      .withColumn("__shard", hashBucket(keyCol, nShards))
      .withColumn("start_tok",
        coalesce(sum(tokenCol).over(w) - tokenCol, lit(0L)).cast("long"))
      .withColumn("seq_no", floor(col("start_tok") / budgetTokens).cast("long"))
      .withColumnRenamed("__shard", "shard")
      .drop("__h")
  }

  /** Length-bucketed micro-batching — the dynamic-batching data prep
    * that keeps padding waste bounded: each document lands in the
    * smallest `ladder` bucket that holds its token count (static batch
    * shapes, the XLA/compiler-friendly contract), batches of
    * `batchSize` are cut inside each bucket in deterministic md5(key)
    * order, and every row carries its (bucket_cap, shard, batch_no)
    * assignment. Documents longer than the top rung stay in it
    * (training-side truncation); `tokens_used = least(tokens, cap)` is
    * emitted so waste accounting stays exact.
    *
    * Sharded like [[packSequences]]: the per-bucket window partitions on
    * (bucket, shard), so no single sort ever sees a whole bucket — a
    * corpus where 80% of documents share one length band still fans out
    * across `nShards` sorts. One shuffle; batch numbering is per
    * (bucket, shard), which is all dynamic batching needs (members share
    * a pad target; global numbering buys nothing). */
  def lengthBucketedBatches(df: DataFrame, keyCol: Column,
      tokenCol: Column, batchSize: Int, nShards: Int,
      ladder: Seq[Int] = Seq(16, 32, 64, 128, 256, 512, 1024, 2048, 4096,
        8192)): DataFrame = {
    require(batchSize >= 1 && nShards >= 1 && ladder.nonEmpty &&
      ladder == ladder.sorted, "need positive sizes and a sorted ladder")
    val cap = ladder.init.reverse.foldLeft(lit(ladder.last)) {
      case (acc, rung) => when(tokenCol <= rung, lit(rung)).otherwise(acc)
    }
    val w = Window.partitionBy(col("bucket_cap"), col("shard"))
      .orderBy(col("__h"))
    df.withColumn("__h", md5(keyCol))
      .withColumn("shard", hashBucket(keyCol, nShards))
      .withColumn("bucket_cap", cap)
      .withColumn("batch_no",
        floor((row_number().over(w) - 1) / batchSize).cast("long"))
      .withColumn("tokens_used",
        least(tokenCol, col("bucket_cap")).cast("long"))
      .drop("__h")
  }

  /** Token-budget domain mixing — real training mixes are specified as
    * "N tokens from this source", not "a fraction of its documents":
    * within each stratum, documents are taken in deterministic md5(key)
    * order until the cumulative token count reaches `budget` (the doc
    * whose FIRST token lands inside the budget is kept whole, so the
    * take slightly overshoots rather than truncating a document).
    * One shuffle on the stratum key; the running sum is a per-stratum
    * window with an explicit ROWS frame (unique md5 keys make RANGE and
    * ROWS agree, but the intent is positional). Output keeps the
    * cumulative count for auditability. */
  def takeTokenBudget(df: DataFrame, keyCol: Column, strataCol: Column,
      tokenCol: Column, budget: Column): DataFrame =
    takeTokenBudgetOrdered(df, Seq(md5(keyCol)), strataCol, tokenCol, budget)

  /** The general budget-fill: take rows per stratum in an EXPLICIT total
    * order until the cumulative token count reaches `budget` (the row
    * whose first token lands inside the budget is kept whole). The md5
    * variant above is the sampling spelling; a rank-ordered ranking
    * (e.g. RAG context packing) passes its rank columns instead. */
  def takeTokenBudgetOrdered(df: DataFrame, order: Seq[Column],
      strataCol: Column, tokenCol: Column, budget: Column): DataFrame = {
    val w = Window.partitionBy(strataCol).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(tokenCol).over(w).cast("long"))
      .filter(col("cum_tokens") - tokenCol < budget)
  }

  /** Deterministic global shuffle, the scalable way: no total order (a
    * global sort/row_number pulls everything through one range exchange),
    * but hash-assigned shards with a deterministic position inside each —
    * one shuffle on the shard key, per-shard sorts run in parallel, and
    * a training job reads shards in any order knowing the permutation is
    * reproducible. Position ties are impossible: md5 of a unique key.
    * Size `nShards` to the cluster, not the data: each shard is one sort
    * partition, so at corpus scale pick thousands (shards ≈ a few GB),
    * never a handful. */
  def shuffleShards(df: DataFrame, keyCol: Column, nShards: Int): DataFrame = {
    val h = md5(keyCol)
    val w = Window.partitionBy(col("__shard")).orderBy(col("__h"))
    df.withColumn("__h", h)
      .withColumn("__shard", hashBucket(keyCol, nShards))
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumnRenamed("__shard", "shard")
      .drop("__h")
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document
    * by how much more likely its hashed n-gram bag is under the TARGET
    * distribution (rows where `isTarget`) than under the RAW corpus
    * distribution. Features are unigrams + bigrams hashed into 4096
    * buckets by the first 3 hex chars of md5 — the same cross-engine
    * hash family as [[hashBucket]], so DuckDB computes identical
    * buckets. Bucket log-ratios use add-one smoothing and are quantized
    * to integer MILLI-units BEFORE the per-doc sum, so the document
    * weight is an exact integer sum with no float-accumulation-order in
    * the compare surface.
    *
    * Scale shape: one codegen JVM kernel per doc emits the feature
    * buckets ([[graft.expr.SketchRuntime.md5NgramBuckets]] — the former
    * `zip_with` spelling is CodegenFallback and its interpreted
    * per-element lambdas were the dominant term at 10× bench data), one
    * explode, one hash-shuffle groupBy for bucket stats (≤4096 rows),
    * totals ride a broadcast cross join (no driver collect), the ratio
    * table broadcasts back onto the token stream, one per-doc sum.
    * Linear in corpus tokens, zero extra shuffles. The feature stream is
    * NOT persisted: the kernel re-tokenizes for the scoring pass, which
    * measures cheaper than building + reading a 2·tokens-row cache (the
    * fanout exchange under both consumers is reused, so the doc scan
    * itself is shared). Buckets are the md5 hex prefix as an INT (12
    * bits = 3 hex chars, a bijection) — the oracle's string form groups
    * identically.
    *
    * Output: (id, w_milli) — one row per input row with NON-NULL text
    * (null text explodes to no feature rows, so the doc gets no weight —
    * the oracle drops it identically; coalesce upstream to score nulls
    * as empty docs). */
  def dsirWeights(df: DataFrame, keyCol: Column, textCol: Column,
      isTarget: Column): DataFrame = {
    val nBuckets = 4096 // 16^3: 3 hex chars of md5
    val ex = ScaleHints.fanout(
        df.select(keyCol.as("id"), isTarget.as("is_t"), textCol.as("__txt")))
      .select(col("id"), col("is_t"),
        explode(graft.expr.sketchFunctions.md5_ngram_buckets(col("__txt")))
          .as("bkt"))
    // MATERIALIZED (eager): stats is ≤ nBuckets rows but feeds BOTH
    // `totals` and `lr` — left lazy, the second reference re-evaluates
    // the whole feature stream (another corpus scan + tokenize + explode
    // + 4096-way aggregate; measured at sf0.1 the un-cut sample_dsir
    // plan scanned documents 6×). The cut pins the corpus-scale passes
    // to the documented two: one stats build, one scoring join.
    val stats = ex.groupBy("bkt").agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
      count(lit(1)).as("cr"))
      .localCheckpoint(true)
    val totals = stats.agg(sum("ct").as("nt"), sum("cr").as("nr"))
    val lr = stats.crossJoin(broadcast(totals))
      .select(col("bkt"),
        floor(lit(1000.0) * (
          log((col("ct") + 1).cast("double") / (col("nt") + nBuckets).cast("double")) -
          log((col("cr") + 1).cast("double") / (col("nr") + nBuckets).cast("double"))
        )).cast("long").as("lr_milli"))
    ex.join(broadcast(lr), Seq("bkt"))
      .groupBy(col("id"))
      .agg(sum("lr_milli").as("w_milli"))
  }

  /** Gumbel top-k resample over [[dsirWeights]] output: each row's key
    * is w_milli + ⌊1000·g⌋ with g = −ln(−ln(u)) and u the row's
    * deterministic hash uniform — the Gumbel-max trick, so the k kept
    * rows are a without-replacement sample with probability ∝ exp(w),
    * replayable in SQL with no RNG state.
    *
    * Scale shape: the k-th key is found with orderBy+limit(k) (Spark's
    * TakeOrdered — a per-partition partial top-k merged on the driver,
    * bounded by k rows, never a global sort), broadcast back as a
    * threshold. Keep k well under driver memory; kept count is exactly
    * k via the (key, id) total order.
    *
    * Output: input columns + (key_milli, kept). */
  def dsirResample(weighted: DataFrame, idCol: String, wCol: String,
      k: Int): DataFrame = {
    // the tie-break negates the id, so a non-numeric id would make the
    // secondary sort key silently NULL and break the exactly-k contract
    require(weighted.schema(idCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"dsirResample needs a numeric '$idCol' for the total-order " +
        s"tie-break; got ${weighted.schema(idCol).dataType}")
    val u = (hashBucket(col(idCol).cast("string"), 10000000).cast("double") +
      0.5) / 1e7
    // MATERIALIZED (eager, serialized): keyed feeds both the k-th-key
    // probe and the output join — left lazy, the output side re-runs the
    // caller's ENTIRE weight derivation (for DSIR that is a full corpus
    // scan + tokenize; measured as half of sample_dsir's 6 document
    // scans). The stored frame is one narrow row per weighted doc —
    // O(corpus rows), not O(corpus bytes) — traded against a second
    // corpus pass.
    val keyed = weighted.withColumn("key_milli",
      col(wCol) + floor(lit(1000.0) * -log(-log(u))).cast("long"))
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    // total order (key desc, id asc) rendered as a struct so the k-th
    // element is a single min() over the TakeOrdered prefix; resolution
    // is by name against whichever frame the expression lands in
    val ordExpr = struct(col("key_milli"), (lit(0L) - col(idCol)).as("nid"))
    val kth = keyed.orderBy(col("key_milli").desc, col(idCol).asc).limit(k)
      .agg(min(ordExpr).as("__kth"))
    keyed.crossJoin(broadcast(kth))
      // null kth = empty input; nothing to keep
      .withColumn("kept", coalesce(ordExpr >= col("__kth"), lit(false)))
      .drop("__kth")
  }

  /** Importance weights that steer the OBSERVED stratum mixture toward
    * a TARGET mixture — the glue between profiling (what the corpus is)
    * and [[mixEpochs]]/[[weightedSample]] (what to do about it):
    * weight ∝ target_share / actual_share, per stratum.
    *
    * All-integer: weight_milli = ⌊target_milli · N / n_s⌋ (targets need
    * not sum to 1000 — a common scale factor cancels when the weights
    * feed a normalized sampler), clamped to [minMilli, maxMilli] with
    * the clamp flagged — an unbounded weight on a rare stratum is how
    * mixture correction turns three documents into 4% of a training
    * run. One count shuffle on the stratum key; the totals row and the
    * target table broadcast. Observed strata MISSING from `targets`
    * surface with NULL weight_milli/clamped (LEFT join) — a
    * mixture-correction tool must never silently drop a stratum it has
    * no signal for; callers decide whether null means "exclude" or
    * "weight 1000". Output: (stratum, n_docs, share_milli,
    * weight_milli, clamped). */
  def reweightToTarget(df: DataFrame, groupCol: String, targets: DataFrame,
      targetCol: String, minMilli: Long, maxMilli: Long): DataFrame = {
    require(minMilli <= maxMilli)
    // MATERIALIZED when a re-scan is costly: counts feeds both the
    // total and the output join — same rule as [[temperatureWeights]].
    val counts = ScaleHints.cutIfRescanCostly(
      df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_docs")))
    val tot = counts.agg(sum("n_docs").cast("long").as("__N"))
    counts.crossJoin(broadcast(tot))
      .join(ScaleHints.maybeBroadcast(targets), Seq(groupCol), "left")
      .withColumn("share_milli", expr("1000 * n_docs div __N"))
      .withColumn("__wraw", expr(s"$targetCol * __N div n_docs"))
      // greatest/least SKIP nulls, so a missing target would silently
      // clamp to minMilli — gate on the raw weight to keep it null
      .withColumn("weight_milli",
        when(col("__wraw").isNotNull,
          least(greatest(col("__wraw"), lit(minMilli)), lit(maxMilli))))
      .withColumn("clamped",
        (col("__wraw") =!= col("weight_milli")).cast("int"))
      .select(col(groupCol), col("n_docs"), col("share_milli"),
        col("weight_milli"), col("clamped"))
  }
}
