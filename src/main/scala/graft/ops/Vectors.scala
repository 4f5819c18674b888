package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.expr.vectorFunctions.dot_product
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector

/** Similarity search over embedding columns (`array<float>`) — builder-
  * prompt extension family. All math runs inside whole-stage codegen via
  * the native [[graft.expr.DotProductExpr]] kernel: no UDF, no encoder
  * round-trip, no interpreted lambdas, double accumulation in
  * deterministic left-to-right order.
  *
  * Scale shape: queries are the small side and are broadcast; the corpus
  * streams. Brute force is the exact baseline (one pass, no shuffle until
  * the per-query top-k); the hyperplane-LSH variant buckets both sides so
  * only same-bucket pairs are scored (bounded shuffle on bucket id).
  */
object Vectors {

  import ScaleHints.{fanout, maybeBroadcast}

  /** Σ aᵢ·bᵢ in double, left-to-right — a native codegen'd kernel
    * ([[graft.expr.DotProductExpr]]); the HOF formulation
    * (`aggregate(zip_with(...))`) computes the same value ~50× slower
    * because lambda bodies are interpreted per element. */
  def dot(a: Column, b: Column): Column = dot_product(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Shared ranking tail of every ANN operator: (qid, cid, score) →
    * (qid, cid, rk 1..k), score desc, cid as the deterministic
    * tie-break. One qid-partitioned window, WindowGroupLimit-prunable. */
  private[ops] def rankByScore(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("cid"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("qid"), col("cid"), col("rk"))
  }

  /** Shared nProbe-nearest-centroid probe (the IVF routing step): one
    * UDF over the driver-side centroid table. Bounded selection — an
    * insertion buffer of nProbe entries, O(nCells·nProbe) with zero
    * per-row allocation beyond the buffers — instead of materializing
    * and full-sorting all nCells distances per query row (measured at
    * 4096 cells × nProbe 8: ~3.7× less time than the sort path, and no
    * (Double, Int) tuple garbage). Ties keep centroid index order
    * (strict `>` during insertion = the stable sort it replaces). */
  private[ops] def probeCellsUdf(centroids: Array[(Array[Double], Int)],
      nProbe: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (v: Seq[Float]) =>
      val n = math.min(nProbe, centroids.length)
      if (n <= 0) Seq.empty[Int] else {
      val bd = new Array[Double](n)
      val bi = new Array[Int](n)
      var filled = 0
      centroids.foreach { case (c, idx) =>
        var d = 0.0
        var j = 0
        while (j < c.length && j < v.length) {
          val diff = v(j) - c(j); d += diff * diff; j += 1
        }
        if (filled < n || d < bd(filled - 1)) {
          var pos = filled
          while (pos > 0 && bd(pos - 1) > d) pos -= 1
          if (pos < n) {
            var m = math.min(filled, n - 1)
            while (m > pos) { bd(m) = bd(m - 1); bi(m) = bi(m - 1); m -= 1 }
            bd(pos) = d; bi(pos) = idx
            if (filled < n) filled += 1
          }
        }
      }
      bi.take(filled).toSeq
      }
    }

  /** Shared exact-refinement tail (the FAISS IndexRefine shape): rejoin
    * the bounded (qid, cid) candidate set with query vectors and the
    * full-precision corpus, exact cosine, top-k. `corpus` must carry
    * (cid, cv, cn). */
  private[ops] def exactCosineRefine(cand: DataFrame, q: DataFrame,
      corpus: DataFrame, k: Int): DataFrame = {
    val probe = cand.join(maybeBroadcast(q), Seq("qid"))
    rankByScore(corpus
      .join(maybeBroadcast(probe), Seq("cid"))
      .select(col("qid"), col("cid"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("score")), k)
  }

  /** Exact top-k cosine neighbors for each query row.
    * Output: (qid, cid, rk) with rk 1..k, ranked by cosine desc with cid
    * as the deterministic tie-break. Queries are broadcast; the scored
    * stream shuffles once, partitioned by qid, for the ranking. */
  def annBruteForceTopK(queries: DataFrame, corpus: DataFrame,
      qIdCol: String, cIdCol: String, qVecCol: String, cVecCol: String,
      k: Int): DataFrame = {
    // norms precomputed once per row, not once per pair
    val q = queries.select(col(qIdCol).as("qid"), col(qVecCol).as("qv"),
      norm(col(qVecCol)).as("qn"))
    val c = fanout(corpus.select(col(cIdCol).as("cid"), col(cVecCol).as("cv"),
      norm(col(cVecCol)).as("cn")))
    val scored = c.join(maybeBroadcast(q), col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("score"))
    rankByScore(scored, k)
  }

  /** Deterministic random hyperplanes (seed-fixed gaussian) for LSH. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-pattern bucket id of a vector under the given hyperplanes. */
  def hyperplaneBuckets(vec: Column, planes: Seq[Seq[Double]]): Column =
    (0 until planes.length).map { i =>
      when(dot(vec, typedlit(planes(i))) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Cap an ML fit input at `maxRows` via a seed-fixed sample — the
    * shared bounded-fit discipline of every estimator here (KMeans, PCA):
    * an iterative fit over the full corpus is a multi-pass 100 TB job to
    * estimate what a bounded sample estimates at fixed cost. Costs one
    * count() pass to size the fraction. */
  private[ops] def boundedFitSample(df: DataFrame, maxRows: Long,
      seed: Long): DataFrame = {
    val n = df.count()
    if (n <= maxRows) df
    else df.sample(withReplacement = false, maxRows.toDouble / n, seed)
  }

  /** A prebuilt IVF (inverted-file) coarse quantizer: the centroid table
    * (driver-side, nCells rows) plus the cell-assigned corpus. Build once
    * with [[ivfBuild]], query many times with [[annIvfTopK]] — the
    * corpus-scale contract, where `assigned` is persisted or written back
    * with `cell` as a partition key so future queries prune whole files. */
  final case class IvfIndex(
      centroids: Array[(Array[Double], Int)], assigned: DataFrame)

  /** Fit the KMeans coarse quantizer and assign every corpus row a cell.
    *
    * The fit input is capped at `fitSampleRows` via a seed-fixed sample:
    * KMeans is iterative, so fitting the full corpus would be a
    * multi-pass 100 TB ML job just to place nCells centroids — a bounded
    * sample estimates the same density at fixed cost (FAISS trains its
    * quantizers the same way). Assignment stays a single full pass.
    * Everything is seed-deterministic, sample included. */
  def ivfBuild(corpus: DataFrame, cIdCol: String, cVecCol: String,
      nCells: Int = 16, fitSampleRows: Long = 100000L,
      seed: Long = 42L): IvfIndex = {
    val asVec = corpus.select(col(cIdCol).as("cid"), col(cVecCol).as("cv"))
      .withColumn("__features", array_to_vector(col("cv").cast("array<double>")))
    val fitDf = boundedFitSample(asVec, fitSampleRows, seed)
    val km = new KMeans().setK(nCells).setSeed(seed)
      .setFeaturesCol("__features").setPredictionCol("cell")
      .fit(fitDf)
    val assigned = km.transform(asVec)
      .select(col("cid"), col("cv"), norm(col("cv")).as("cn"), col("cell"))
    IvfIndex(km.clusterCenters.map(_.toArray).zipWithIndex, assigned)
  }

  /** IVF approximate top-k against a prebuilt index: each query scores
    * only the cells whose centroids are nearest (`nProbe`), shrinking
    * candidates by ~nProbe/nCells. Recall grows with nProbe;
    * nProbe = nCells degenerates to exact. */
  def annIvfTopK(queries: DataFrame, index: IvfIndex,
      qIdCol: String, qVecCol: String, k: Int, nProbe: Int,
      pruneFiles: Boolean): DataFrame = {
    // nProbe nearest centroids per query, computed against the tiny
    // driver-side centroid table carried into the closure
    val q = queries.select(col(qIdCol).as("qid"), col(qVecCol).as("qv"),
      norm(col(qVecCol)).as("qn"))
    val probeCells = probeCellsUdf(index.centroids, nProbe)
    val qProbed = q.withColumn("cell", explode(probeCells(col("qv"))))

    // With a saved index (assigned partitioned by cell on disk), turning
    // the batch's probe set into a STATIC IN-filter prunes whole files at
    // planning time — the one driver-side collect is bounded by nCells
    // (≤ distinct cells, never data size), the standard static-partition-
    // pruning shape. Off by default: an unsaved in-memory index gains
    // nothing and the collect would force an extra job.
    val corpus =
      if (pruneFiles) {
        val cells = qProbed.select("cell").distinct().collect().map(_.getInt(0))
        index.assigned.filter(col("cell").isin(cells.toIndexedSeq: _*))
      } else index.assigned
    val scored = corpus.join(maybeBroadcast(qProbed), Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("score"))
    rankByScore(scored, k)
  }

  /** Convenience: build-and-query in one call (bench/test shape). At
    * corpus scale prefer [[ivfBuild]] once + the index overload per
    * query batch — fit-per-call was the round-1 scale flaw here. */
  def annIvfTopK(queries: DataFrame, corpus: DataFrame,
      qIdCol: String, cIdCol: String, qVecCol: String, cVecCol: String,
      k: Int, nCells: Int = 16, nProbe: Int = 4,
      fitSampleRows: Long = 100000L): DataFrame =
    annIvfTopK(queries,
      ivfBuild(corpus, cIdCol, cVecCol, nCells, fitSampleRows),
      qIdCol, qVecCol, k, nProbe, pruneFiles = false)

  /** Incremental ingest — the FAISS add-after-train contract: assign a
    * NEW batch to the EXISTING centroids (nearest-Euclidean, the same
    * rule KMeans.transform applies at build) and union it into the
    * index. No refit, no corpus reshuffle — batch cost is one bounded
    * map over the batch, so continuous ingest amortizes the quantizer
    * exactly like [[graft.ops.Dedup.minHashDedupeAgainst]] amortizes the
    * sketch. With a SAVED index the ingested rows write `mode("append")`
    * into `assigned/` (they land in their `cell=` directories; existing
    * files untouched). Quantizer drift is the operational caveat: once
    * the ingested distribution departs from the trained one, cells
    * unbalance — monitor per-cell counts ([[graft.ops.Profile.keySkew]])
    * and re-train offline when skew crosses the line. */
  def ivfIngest(index: IvfIndex, batch: DataFrame, cIdCol: String,
      cVecCol: String): IvfIndex = {
    val assignCell = probeCellsUdf(index.centroids, 1)
    val assigned = batch.select(col(cIdCol).as("cid"), col(cVecCol).as("cv"))
      .withColumn("cell", assignCell(col("cv"))(0))
      .select(col("cid"), col("cv"), norm(col("cv")).as("cn"), col("cell"))
    IvfIndex(index.centroids, index.assigned.unionByName(assigned))
  }

  /** Persist an IVF index: the centroid table as a tiny parquet file and
    * the assigned corpus PARTITIONED BY CELL — on disk each cell is its
    * own directory, so a query batch that probes nProbe of nCells cells
    * reads only that fraction of the files (static pruning via an IN
    * filter, or Spark's dynamic partition pruning through the cell join).
    * This is the "write the assignment back as a partition key" 100 TB
    * contract from the scaladoc above, made concrete. */
  def ivfSave(index: IvfIndex, path: String): Unit = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    index.centroids.toSeq.map { case (c, i) => (i, c.toSeq) }
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    index.assigned.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/assigned")
  }

  /** Load a persisted IVF index; `assigned` comes back partition-pruned
    * by `cell` at the file level. */
  def ivfLoad(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex = {
    val centroids = spark.read.parquet(s"$path/centroids")
      .select(col("cell"), col("centroid")).collect()
      .map(r => (r.getSeq[Double](1).toArray, r.getInt(0)))
      .sortBy(_._2)
    IvfIndex(centroids, spark.read.parquet(s"$path/assigned"))
  }

  /** Approximate top-k: score only candidates sharing one of the query's
    * probed hyperplane buckets. Recall trades against bucket count
    * (2^nPlanes); `nProbe` > 1 turns on multi-probe — the query side also
    * probes the buckets at Hamming distance 1 in nearest-hyperplane-first
    * order (the classic multi-probe LSH heuristic: a near neighbor that
    * falls on the other side of ONE hyperplane is in a 1-bit-flip
    * bucket), recovering most of the recall lost to bucketing without
    * touching the corpus side or the ranking tail. */
  def annLshTopK(queries: DataFrame, corpus: DataFrame,
      qIdCol: String, cIdCol: String, qVecCol: String, cVecCol: String,
      k: Int, nPlanes: Int = 4, dim: Int = 64, nProbe: Int = 1): DataFrame = {
    require(nProbe >= 1 && nProbe <= nPlanes + 1,
      "nProbe counts the home bucket plus up to nPlanes 1-bit flips")
    val planes = hyperplanes(nPlanes, dim)
    // distance of the vector to plane i = |dot| / ||plane||; the planes
    // with the smallest margin are the most likely to have cut off a
    // true neighbor, so their flips are probed first
    val margins = (0 until nPlanes).map { i =>
      val p = planes(i)
      abs(dot(col(qVecCol), typedlit(p))) / lit(math.sqrt(p.map(x => x * x).sum))
    }
    val home = hyperplaneBuckets(col(qVecCol), planes)
    val flipOrder = array_sort(arrays_zip(
      array(margins: _*).as("m"),
      array((0 until nPlanes).map(i => home.bitwiseXOR(lit(1 << i))): _*).as("b")))
    val probes = slice(
      concat(array(home), transform(flipOrder, s => s.getField("b"))),
      1, nProbe)
    val q = queries.select(col(qIdCol).as("qid"), col(qVecCol).as("qv"),
      norm(col(qVecCol)).as("qn"), explode(probes).as("bucket"))
    val c = fanout(corpus.select(col(cIdCol).as("cid"), col(cVecCol).as("cv"),
      norm(col(cVecCol)).as("cn"),
      hyperplaneBuckets(col(cVecCol), planes).as("bucket")))
    val scored = c.join(maybeBroadcast(q), Seq("bucket"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("score"))
    // no dedupe needed: probes are distinct buckets and each corpus row
    // lives in exactly one bucket, so a (qid, cid) pair matches at most once
    rankByScore(scored, k)
  }

  /** Recall@k scoreboard: per query, the fraction of the EXACT top-k an
    * approximate result (IVF/LSH/quantized) actually returned — the
    * evaluation loop that tunes nProbe/nPlanes/quantization against a
    * brute-force sample. Both inputs are (qCol, idCol, …) result tables
    * from the ann* operators; output is one row per exact-side query.
    * Cost is a single equi hash join on (qid, cid) and a tiny aggregate —
    * evaluate on a sampled query set, never the full corpus. */
  def recallAtK(approx: DataFrame, exact: DataFrame,
      qCol: String, idCol: String, k: Int): DataFrame = {
    val e = exact.select(col(qCol).as("qid"), col(idCol).as("cid"))
    val a = approx.select(col(qCol).as("qid"), col(idCol).as("cid"),
      lit(1).as("__hit"))
    e.join(a, Seq("qid", "cid"), "left")
      .groupBy("qid")
      .agg(count(col("__hit")).as("n_hits"),
        (count(col("__hit")).cast("double") / lit(k)).as("recall"))
  }

  /** PCA projection of an embedding column to `kDims` — the storage /
    * ANN-prefilter reduction (project once, scan the narrow matrix).
    * The rotation fits on a bounded seed-fixed sample (same rationale as
    * [[ivfBuild]]: the eigenbasis of a covariance estimate needs a
    * sample, not a 100 TB pass); projection of the full corpus is one
    * shuffle-free map. Each component's sign is canonicalized (largest-
    * |loading| coordinate positive) so the output is reproducible across
    * refits — eigenvectors are only defined up to sign.
    *
    * Spark-ML quirk kept as-is: `PCA.transform` multiplies the RAW
    * vector by the rotation (no mean subtraction), so projections carry
    * the mean offset — harmless for distance work, every row shares it.
    *
    * Output: (id, pc1_milli … pck_milli) — milli-quantized projections,
    * scalar columns (driver-compare-safe). */
  def pcaProject(df: DataFrame, idCol: String, vecCol: String, kDims: Int,
      fitSampleRows: Long = 100000L, seed: Long = 42L): DataFrame = {
    val (model, signs, asVec) = pcaFit(df, idCol, vecCol, kDims, fitSampleRows, seed)
    val projArr = org.apache.spark.ml.functions.vector_to_array(col("__proj"))
    val outCols = (0 until kDims).map { c =>
      floor(lit(1000.0) * lit(signs(c)) * projArr.getItem(c))
        .cast("long").as(s"pc${c + 1}_milli")
    }
    model.transform(asVec).select(col("id") +: outCols: _*)
  }

  /** Shared PCA fit + sign canon (the coordinate with the largest
    * |loading| per component must be positive; ties take the first such
    * coordinate — eigenvectors are only defined up to sign). The fit is
    * deterministic for a given input (seed-fixed sample, exact
    * eigendecomposition), which is what lets [[pcaRotationFrame]] refit
    * and export the SAME rotation the projection used. */
  private def pcaFit(df: DataFrame, idCol: String, vecCol: String,
      kDims: Int, fitSampleRows: Long, seed: Long):
      (org.apache.spark.ml.feature.PCAModel, Seq[Double], DataFrame) = {
    val asVec = df.select(col(idCol).as("id"),
      array_to_vector(col(vecCol).cast("array<double>")).as("__features"))
    val fitDf = boundedFitSample(asVec, fitSampleRows, seed)
    val model = new org.apache.spark.ml.feature.PCA()
      .setK(kDims).setInputCol("__features").setOutputCol("__proj")
      .fit(fitDf)
    val pc = model.pc // dim x k, column-major
    val dim = pc.numRows
    val signs = (0 until kDims).map { c =>
      val coords = (0 until dim).map(r => pc(r, c))
      val lead = coords.maxBy(math.abs)
      if (lead < 0) -1.0 else 1.0
    }
    (model, signs, asVec)
  }

  /** The signed rotation as a table — (comp 1-based, loading DOUBLE[dim]
    * with the sign canon folded in). This is the PCA analogue of the
    * exported IVF centroids: a fit artifact the SQL oracle reads back to
    * replay the projection as one inner product per component. */
  def pcaRotationFrame(df: DataFrame, idCol: String, vecCol: String,
      kDims: Int, fitSampleRows: Long = 100000L,
      seed: Long = 42L): DataFrame = {
    val (model, signs, _) = pcaFit(df, idCol, vecCol, kDims, fitSampleRows, seed)
    val pc = model.pc
    val dim = pc.numRows
    val spark = df.sparkSession
    import spark.implicits._
    (0 until kDims).map { c =>
      (c + 1, (0 until dim).map(r => pc(r, c) * signs(c)))
    }.toDF("comp", "loading")
  }
}
