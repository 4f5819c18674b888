package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fingerprinting, dedup, and delta-ingest core (SURVEY.md §2.3/§2.4/§2.7:
  * P1/P2, D1/D2, J1, U1). This is the heart of the reference's idempotent
  * ingest: deterministic MD5 ids → anti-join vs the master table → union
  * update with new-records-first ordering.
  *
  * Scale notes: the anti-join broadcasts when the master fits
  * (`spark.sql.autoBroadcastJoinThreshold`); at 100 TB the master is
  * hash-partitioned on `rag_id` so the anti-join is a co-partitioned
  * shuffle once, reused by the union update (same key).
  */
object Fingerprint {

  /** P1 — deterministic doc id = MD5 of the url/basis string, null-safe.
    * Ref: fda_rag_extraction/scripts/fda_watcher.py:86-93. */
  def ragId(basis: Column): Column = md5(basis)

  /** P2 — id basis: url if non-empty else `title_date`.
    * Ref: fda_rag_extraction/scripts/fda_watcher.py:328. */
  def idBase(url: Column, title: Column, date: Column): Column =
    coalesce(nullif(trim(url), lit("")), concat_ws("_", title, date))

  /** D2 — content hash of the cleaned corpus for change detection.
    * Ref: fda_rag_extraction/scripts/json_split_and_clean.py:313. */
  def contentHash(corpus: Column): Column = md5(corpus)

  /** D1 — idempotent dedup by fingerprint: one surviving row per rag_id,
    * deterministically the minimum `tieBreak` (dropDuplicates keeps an
    * arbitrary row — unacceptable for a reproducible engine).
    * Ref: fda_rag_extraction/scripts/fda_watcher.py:86-93 + README claim. */
  def dedupByFingerprint(df: DataFrame, idCol: String, tieBreak: String): DataFrame = {
    val others = df.columns.filter(c => c != idCol && c != tieBreak)
    // min_by pairs every column with the tie-break key in one hash
    // aggregate — single shuffle on the fingerprint, no window sort.
    df.groupBy(col(idCol))
      .agg(min(col(tieBreak)).as(tieBreak),
        others.toIndexedSeq.map(c => min_by(col(c), col(tieBreak)).as(c)): _*)
      .select(df.columns.toIndexedSeq.map(col): _*)
  }

  /** J1 — delta detection: rows of `fresh` whose id is absent from
    * `master`. Broadcast-anti when master is small.
    * Ref: fda_rag_extraction/scripts/fda_watcher.py:399-400. */
  def deltaAntiJoin(fresh: DataFrame, master: DataFrame, idCol: String): DataFrame =
    fresh.join(master.select(col(idCol)), Seq(idCol), "left_anti")

  /** U-family extension — SCD2 (type-2 slowly-changing-dimension) history
    * maintenance, the versioned form of the master-table update: instead
    * of overwriting a changed record, the current row is CLOSED
    * (`valid_to` stamped) and the new version opens (`valid_from`
    * stamped, `valid_to` null). History rows must carry `valid_from` /
    * `valid_to` (null = current). One full-outer equi-join on the id —
    * already-closed rows never join; change detection is an md5 over the
    * payload columns computed per side (never per pair). Deterministic:
    * the stamp is an injected literal, not now(). */
  def scd2Apply(history: DataFrame, updates: DataFrame, idCol: String,
      payloadCols: Seq[String], ts: String): DataFrame = {
    def payloadHash(prefix: String): Column = md5(concat_ws("\u0001",
      payloadCols.map(c => coalesce(col(prefix + c).cast("string"), lit("\u0002"))): _*))
    val closed = history.filter(col("valid_to").isNotNull)
    val current = history.filter(col("valid_to").isNull)

    val u = updates.select(
      col(idCol) +: payloadCols.map(c => col(c).as(s"__u_$c")): _*)
      .withColumn("__has_u", lit(1))
    val j = current.join(u, Seq(idCol), "full_outer")
      .withColumn("__same",
        payloadHash("") === payloadHash("__u_"))

    // ONE pass over the join: each joined row emits its keep / close /
    // open row(s) through a conditional array + explode. The former
    // three-branch union re-planned `j` per branch — three full-outer
    // joins of the master table per apply (the nulled branches of a
    // when() array cost a row-local compare instead). Row multiplicity
    // is identical: keep xor (close + open), plus open for new ids.
    val outCols = history.columns.toIndexedSeq
    def asOut(f: String => Column): Column =
      struct(outCols.map(c => f(c).as(c)): _*)
    val keepRow = asOut(c => col(c))
    val closeRow = asOut {
      case "valid_to" => lit(ts).cast("string")
      case c => col(c)
    }
    val openRow = asOut {
      case "valid_from" => lit(ts).cast("string")
      case "valid_to" => lit(null).cast("string")
      case c if c == idCol => col(idCol)
      case c => col(s"__u_$c")
    }
    val emitted = j.select(explode(array(
        when(col("valid_from").isNotNull &&
          (col("__has_u").isNull || col("__same")), keepRow),
        when(col("valid_from").isNotNull &&
          col("__has_u").isNotNull && !col("__same"), closeRow),
        when(col("__has_u").isNotNull &&
          (col("valid_from").isNull || !col("__same")), openRow)))
        .as("__r"))
      .filter(col("__r").isNotNull)
      .select(outCols.map(c => col(s"__r.$c")): _*)

    closed.unionByName(emitted)
  }

  /** Point-in-time lookup against an SCD2 history (the read side of
    * [[scd2Apply]]): each probe row resolves to THE version whose
    * [valid_from, valid_to) interval contains its `probeTsCol` — "what
    * did this dimension row look like when the event happened". ISO-8601
    * date strings compare lexicographically = chronologically, so the
    * residual predicates are plain string compares on both engines. The
    * join is an EQUI join on the id (versions-per-id is small, so the
    * residual scan after the hash match is bounded) — no range binning
    * needed, unlike a pure interval join. */
  def scd2Lookup(history: DataFrame, probes: DataFrame, idCol: String,
      probeTsCol: String): DataFrame = {
    val h = history.withColumnRenamed(idCol, "__h_id")
    probes.join(h, probes(idCol) === h("__h_id") &&
        col("valid_from") <= col(probeTsCol) &&
        (col("valid_to").isNull || col(probeTsCol) < col("valid_to")))
      .drop("__h_id")
  }

  /** J1 at corpus scale: a Bloom pre-filter splits `fresh` BEFORE any
    * shuffle — ids the filter has definitely never seen are new by
    * construction and skip the join entirely; only the (churn-sized)
    * possible-hit remainder pays the exact anti-join, which also makes
    * the result exact despite Bloom false positives. The filter is built
    * with one master scan (`stat.bloomFilter`, driver-merged, broadcast);
    * size `expectedItems` to the master's id cardinality and keep
    * `fpp` moderate — at 1% only ~1% of genuinely-new rows take the
    * expensive path by accident. Semantics are EXACTLY [[deltaAntiJoin]]
    * (asserted in OpsSpec, including under a deliberately tiny, high-FPP
    * filter). */
  def deltaAntiJoinBloom(fresh: DataFrame, master: DataFrame, idCol: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val bf = master.stat.bloomFilter(idCol, expectedItems, fpp)
    val bfB = fresh.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((s: String) => bfB.value.mightContainString(s))
    val definitelyNew = fresh.filter(!mightContain(col(idCol)))
    val possibleHits = fresh.filter(mightContain(col(idCol)))
    definitelyNew.unionByName(deltaAntiJoin(possibleHits, master, idCol))
  }

  /** D3 — checkpoint semantics: drop inputs whose id already appears in
    * the processed-output listing (reference: skip-if-output-file-exists,
    * pdf_marker_extraction.py:355-360, pubmed_enrichment.py:338-343).
    * Same anti-join shape as J1 — state is the output table. */
  def skipProcessed(inputs: DataFrame, processed: DataFrame, idCol: String): DataFrame =
    deltaAntiJoin(inputs, processed, idCol)

  /** P10 — ingest timestamp stamp; instant injected for determinism
    * (current_timestamp() in production, fda_watcher.py:338). */
  def addIngestTimestamp(df: DataFrame, instant: Column): DataFrame =
    df.withColumn("scraped_at", instant)

  /** U1 — master update: new records first, then the old master. Row order
    * is not a Spark table property, so the contract is materialized as an
    * explicit `ingest_seq` (0 = newest batch).
    * Ref: fda_rag_extraction/scripts/fda_watcher.py:549-553. */
  def unionMasterUpdate(fresh: DataFrame, master: DataFrame, seqCol: String): DataFrame =
    fresh.withColumn(seqCol, lit(0L))
      .unionByName(master.withColumn(seqCol, lit(1L)))

  /** MERGE/upsert semantics over the master table: every update row wins
    * over its keyed master row; master rows without an update survive.
    * Composed as updates ∪ (master ⟕anti updates) — one broadcast/hash
    * anti-join when updates are the small side, no full-table rewrite of
    * unmatched rows beyond the copy the storage layer needs anyway (the
    * Delta/Iceberg MERGE shape without the format). */
  def mergeUpsert(master: DataFrame, updates: DataFrame, idCol: String): DataFrame =
    updates.unionByName(master.join(updates.select(idCol), Seq(idCol), "left_anti"))
}
