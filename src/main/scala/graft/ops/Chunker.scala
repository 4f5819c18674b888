package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking for RAG ingestion (BASELINE.json north star:
  * "batch document ingestion, chunking, and embedding generation").
  *
  * Sliding token windows: chunk i covers tokens [i·stride, i·stride+size),
  * i = 0 … ceil(n/stride)−1 — overlapping when stride < size, trailing
  * chunks shorter. Pure columnar generator (sequence → transform →
  * posexplode): the explode is Spark's native UDTF shape, the chunk count
  * per document is bounded, and nothing leaves whole-stage codegen until
  * the generate.
  */
object Chunker {

  /** Explode `textCol` into (chunk_idx, chunk_text) rows; all other
    * columns pass through. */
  def chunkByTokens(df: DataFrame, textCol: String, size: Int,
      stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      "need 0 < stride <= size (stride < size ⇒ overlap)")
    val toks = split(trim(col(textCol)), "\\s+")
    val n = size_(toks)
    val nChunks = ceil(n.cast("double") / stride).cast("int")
    val chunks = transform(sequence(lit(0), greatest(nChunks - 1, lit(0))),
      i => concat_ws(" ", slice(toks, (i * stride + 1).cast("int"), lit(size))))
    df.withColumn("__chunks", when(n > 0, chunks).otherwise(array().cast("array<string>")))
      .select(col("*"), posexplode(col("__chunks")).as(Seq("chunk_idx", "chunk_text")))
      .drop("__chunks")
  }

  private def size_(c: Column): Column = size(c)
}
