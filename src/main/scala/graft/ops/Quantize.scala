package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
