package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.expr.vectorFunctions.{pq_encode, pq_adc_dot, pq_recon_norm2, dot_product}

/** Embedding quantization — the memory lever for ANN at corpus scale: a
  * float32 embedding matrix is 4 bytes/dim; int8 codes are 1 byte/dim
  * with a per-dimension scale table of `dim` doubles TOTAL, so the
  * brute-force scan, the IVF cell payloads, and the shuffle frames all
  * shrink 4×. (Reference has no quantization; extension family alongside
  * [[Vectors]].)
  *
  * Symmetric per-dimension scalar quantization: scale s_d =
  * max|x_d| / 127 over the corpus, code q = floor(x/s + ½) ∈ [−127, 127]
  * (round-half-up spelled as floor so both engines share the exact
  * expression; Spark's `round` HALF_UPs while DuckDB's rounds away from
  * zero — floor(+½) sidesteps the disagreement). All-zero dimensions
  * quantize to 0. Determinism: max over floats is exact, the divisions
  * are single IEEE ops, floor is exact — engine-identical codes.
  *
  * Output stays EXPLODED (id, dim, q) — columnar, no array reassembly
  * (a collect_list rebuild would hinge on row-arrival order). The scale
  * table is dimension-sized (tiny); the quantize join broadcasts it.
  */
object Quantize {

  import ScaleHints.maybeBroadcast

  /** Per-dimension scales: (dim, s) with s = max|x| / 127; dim 0-based. */
  def int8Scales(df: DataFrame, embCol: String): DataFrame =
    df.select(posexplode(col(embCol)).as(Seq("dim", "x")))
      .groupBy("dim")
      .agg((max(abs(col("x"))).cast("double") / lit(127.0d)).as("s"))

  /** Quantized codes (idCol, dim, q) plus the residual in milli units
    * (floor(1000·|x − q·s|), exact integer — order-safe to aggregate). */
  def int8Codes(df: DataFrame, idCol: String, embCol: String): DataFrame = {
    val scales = int8Scales(df, embCol)
    val e = df.select(col(idCol), posexplode(col(embCol)).as(Seq("dim", "x")))
    val q = when(col("s") === 0d, lit(0L))
      .otherwise(floor(col("x").cast("double") / col("s") + lit(0.5d)))
      .cast("long")
    e.join(maybeBroadcast(scales), Seq("dim"))
      .select(col(idCol), col("dim"), q.as("q"),
        floor(lit(1000) * abs(col("x").cast("double") -
          q.cast("double") * col("s"))).cast("long").as("resid_milli"))
  }

  /** Reconstructed vectors (idCol, recon array<double>): x̂ = q·s — what
    * an ANN scan over the int8 index actually scores against. The array
    * reassembly sorts by dimension (collect_list order is
    * nondeterministic; array_sort on the (dim, xh) structs is not), so
    * the reconstruction is bit-deterministic. */
  def dequantize(df: DataFrame, idCol: String, embCol: String): DataFrame = {
    val scales = int8Scales(df, embCol)
    val e = df.select(col(idCol), posexplode(col(embCol)).as(Seq("dim", "x")))
    val xh = when(col("s") === 0d, lit(0.0d))
      .otherwise(floor(col("x").cast("double") / col("s") + lit(0.5d)) * col("s"))
    e.join(maybeBroadcast(scales), Seq("dim"))
      .select(col(idCol), col("dim"), xh.as("xh"))
      .groupBy(col(idCol))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("xh")))),
        p => p.getField("xh")).as("recon"))
  }

  // ── Product quantization ──────────────────────────────────────────────
  //
  // The next rung past int8: the vector splits into m subvectors, each
  // replaced by the id of its nearest codebook centroid — m bytes per
  // vector instead of 4·dim (64-dim float32 → 8 codes is 32×), with
  // scoring done directly against codes (ADC: gather centroid, fused
  // multiply-accumulate — never materialize the reconstruction). This is
  // the FAISS-PQ design (Jégou et al., "Product Quantization for Nearest
  // Neighbor Search", TPAMI 2011), re-expressed as Spark codegen
  // expressions over a literal codebook.
  //
  // The codebook is fit ONCE on a bounded md5-ordered sample with a
  // deterministic driver-side Lloyd's loop (first-k-distinct init,
  // lower-index tie-breaks, fixed iteration count — byte-identical
  // across runs, like the IVF quantizer contract) and then travels to
  // executors as an m·k·subDim double literal: at query time there is
  // no fit job, only the encode/score map stages.

  /** A fitted PQ codebook: flat [m][k][subDim] centroids. */
  case class PqIndex(m: Int, k: Int, subDim: Int, codebook: Array[Double]) {
    def dim: Int = m * subDim
    private[ops] def codebookCol = typedlit(codebook.toSeq)
  }

  /** Deterministic Lloyd's fit per subspace over a bounded sample (the
    * sample is md5-ordered by id, so appends at the corpus margin leave
    * it — and the codebook — unchanged). Empty clusters keep their old
    * centroid; assignment ties take the lower centroid index. */
  def pqFit(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, k: Int = 16, sampleCap: Int = 4096,
      iters: Int = 12): PqIndex = {
    val sample: Array[Array[Double]] = corpus
      .select(col(vecCol)).orderBy(md5(col(idCol).cast("string")))
      .limit(sampleCap)
      .collect().map(_.getSeq[Float](0).toArray.map(_.toDouble))
    require(sample.nonEmpty, "pqFit needs a non-empty corpus")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m

    val codebook = new Array[Double](m * k * subDim)
    var j = 0
    while (j < m) {
      val pts = sample.map(v => java.util.Arrays.copyOfRange(v, j * subDim, (j + 1) * subDim))
      // init: first k distinct subvectors in sample order (repeat last if short)
      val init = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
      var p = 0
      while (p < pts.length && init.length < k) {
        if (!init.exists(c => java.util.Arrays.equals(c, pts(p))))
          init += pts(p).clone()
        p += 1
      }
      while (init.length < k) init += init.last.clone()
      var cents = init.toArray

      var it = 0
      while (it < iters) {
        val sums = Array.fill(k)(new Array[Double](subDim))
        val counts = new Array[Int](k)
        pts.foreach { x =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < k) {
            var d2 = 0.0; var d = 0
            while (d < subDim) { val t = x(d) - cents(c)(d); d2 += t * t; d += 1 }
            if (d2 < bestD) { bestD = d2; best = c }
            c += 1
          }
          var d = 0
          while (d < subDim) { sums(best)(d) += x(d); d += 1 }
          counts(best) += 1
        }
        cents = Array.tabulate(k) { c =>
          if (counts(c) == 0) cents(c)
          else Array.tabulate(subDim)(d => sums(c)(d) / counts(c))
        }
        it += 1
      }
      var c = 0
      while (c < k) {
        System.arraycopy(cents(c), 0, codebook, (j * k + c) * subDim, subDim)
        c += 1
      }
      j += 1
    }
    PqIndex(m, k, subDim, codebook)
  }

  /** Encode a corpus against a fitted codebook: (idCol, codes array<int>,
    * rn2 = ‖x̂‖²). Pure map stage — this is what gets WRITTEN as the
    * compressed index; rn2 rides along so cosine scoring needs no
    * second gather. */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
      index: PqIndex): DataFrame = {
    val cb = index.codebookCol
    df.select(col(idCol),
        pq_encode(col(vecCol), cb, index.m, index.k).as("codes"))
      .withColumn("rn2", pq_recon_norm2(col("codes"), cb, index.subDim, index.k))
  }

  /** ANN top-k over the PQ-coded corpus (same rank/tie-break contract as
    * [[Vectors.annBruteForceTopK]]): queries broadcast at full precision,
    * corpus scanned as codes — the scan moves m bytes + one double per
    * vector, the memory story that lets a 100 TB embedding matrix fit a
    * cluster's page cache. Asymmetric distance: exact query against
    * reconstructed corpus. */
  def annPqTopK(queries: DataFrame, coded: DataFrame, index: PqIndex,
      qIdCol: String, cIdCol: String, qVecCol: String, k: Int): DataFrame = {
    val cb = index.codebookCol
    val q = queries.select(col(qIdCol).as("qid"), col(qVecCol).as("qv"),
      sqrt(dot_product(col(qVecCol), col(qVecCol))).as("qn"))
    val scored = coded
      .join(ScaleHints.maybeBroadcast(q), col("qid") =!= col(cIdCol))
      .select(col("qid"), col(cIdCol).as("cid"),
        (pq_adc_dot(col("qv"), col("codes"), cb, index.k) /
          (col("qn") * sqrt(col("rn2")))).as("score"))
    graft.ops.Vectors.rankByScore(scored, k)
  }

  /** PQ with a refinement stage (the FAISS `IndexRefine` shape, and the
    * way PQ is actually deployed): the coded scan proposes `rerank`
    * candidates per query by ADC score, then ONLY those rows fetch their
    * full-precision vectors for an exact cosine re-rank to top-k. The
    * expensive side stays m-bytes-per-vector; the exact math touches
    * queries×rerank rows — at corpus scale that's the difference between
    * re-reading 100 TB of floats and re-reading a few megabytes. */
  def annPqRefineTopK(queries: DataFrame, coded: DataFrame, corpus: DataFrame,
      index: PqIndex, qIdCol: String, cIdCol: String, qVecCol: String,
      cVecCol: String, k: Int, rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank=$rerank must be >= k=$k")
    val cand = annPqTopK(queries, coded, index, qIdCol, cIdCol, qVecCol, rerank)
      .select(col("qid"), col("cid"))
    val q = queries.select(col(qIdCol).as("qid"), col(qVecCol).as("qv"),
      sqrt(dot_product(col(qVecCol), col(qVecCol))).as("qn"))
    graft.ops.Vectors.exactCosineRefine(cand, q,
      corpus.select(col(cIdCol).as("cid"), col(cVecCol).as("cv"),
        sqrt(dot_product(col(cVecCol), col(cVecCol))).as("cn")), k)
  }

  /** IVF-PQ (the FAISS `IndexIVFPQ` composition — THE billion-scale ANN
    * shape): the coarse quantizer routes each query to `nProbe` cells,
    * ADC scores only the PQ codes inside those cells, and the `rerank`
    * best fetch full-precision vectors for an exact cosine top-k.
    *
    * Cost at 100 TB: candidate scan = (nProbe/nCells) of the corpus AS
    * CODES (m bytes + a double per vector, not the float matrix), exact
    * math = queries×rerank rows. With the assigned table saved
    * partitioned by cell ([[Vectors.ivfSave]]) the probe set prunes
    * whole files before the scan; the coded columns belong IN that saved
    * table in production — this operator derives them on the fly when
    * absent.
    */
  def annIvfPqTopK(queries: DataFrame, ivf: graft.ops.Vectors.IvfIndex,
      pq: PqIndex, qIdCol: String, qVecCol: String, k: Int,
      nProbe: Int, rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank=$rerank must be >= k=$k")
    val cb = pq.codebookCol
    // coded corpus, cell-keyed: in production these columns live in the
    // saved cell-partitioned index table. Two-step projection on purpose:
    // `codes` must be an attribute before `rn2` references it, so
    // CollapseProject keeps one pq_encode evaluation per row.
    val coded = ivf.assigned
      .select(col("cid"), col("cell"),
        pq_encode(col("cv"), cb, pq.m, pq.k).as("codes"))
      .withColumn("rn2", pq_recon_norm2(col("codes"), cb, pq.subDim, pq.k))
    val probeCells = graft.ops.Vectors.probeCellsUdf(ivf.centroids, nProbe)
    val q = queries.select(col(qIdCol).as("qid"), col(qVecCol).as("qv"),
      sqrt(dot_product(col(qVecCol), col(qVecCol))).as("qn"))
    val qProbed = q.withColumn("cell", explode(probeCells(col("qv"))))
    // ADC proposal inside probed cells only — (qid, cid, adc) is ALL
    // that moves through the proposal window; the float vectors rejoin
    // only for the queries×rerank surviving rows below
    val prop = coded.join(ScaleHints.maybeBroadcast(qProbed), Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (pq_adc_dot(col("qv"), col("codes"), cb, pq.k) /
          (col("qn") * sqrt(col("rn2")))).as("score"))
    val cand = graft.ops.Vectors.rankByScore(prop, rerank)
      .select(col("qid"), col("cid"))
    // exact refine on the surviving queries×rerank rows
    graft.ops.Vectors.exactCosineRefine(cand, q, ivf.assigned, k)
  }
}
