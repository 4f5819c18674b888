package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking for RAG ingestion (BASELINE.json north star:
  * "batch document ingestion, chunking, and embedding generation").
  *
  * Sliding token windows: chunk i covers tokens [i·stride, i·stride+size),
  * i = 0 … ceil(n/stride)−1 — overlapping when stride < size, trailing
  * chunks shorter. The chunk arrays come from one-pass codegen JVM
  * kernels ([[graft.expr.SketchRuntime.chunkWindows]] /
  * [[graft.expr.SketchRuntime.paragraphChunks]]) feeding Spark's native
  * posexplode — the former HOF spellings (transform/sequence/aggregate/
  * zip_with) are CodegenFallback and their interpreted lambdas dominated
  * both chunking queries at 10× bench data; ChunkEmbedSpec pins
  * kernel == HOF on edge strings and a real corpus.
  */
object Chunker {

  /** Explode `textCol` into (chunk_idx, chunk_text) rows; all other
    * columns pass through. */
  def chunkByTokens(df: DataFrame, textCol: String, size: Int,
      stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      "need 0 < stride <= size (stride < size ⇒ overlap)")
    df.withColumn("__chunks",
        graft.expr.sketchFunctions.chunk_windows(col(textCol), size, stride))
      .select(col("*"), posexplode(col("__chunks")).as(Seq("chunk_idx", "chunk_text")))
      .drop("__chunks")
  }

  /** Paragraph-aware chunking: split on blank lines, then pack whole
    * paragraphs into chunks by CUMULATIVE TOKEN BUDGET — paragraph p goes
    * to chunk floor(tokens_before_p / maxTokens). Paragraph boundaries
    * are never split (the property sentence-aware RAG chunking wants);
    * a paragraph larger than maxTokens becomes its own oversized chunk
    * rather than being torn. The assignment is a closed-form expression
    * over the running token count, so it is deterministic, one-pass, and
    * SQL-expressible (the oracle computes the identical fixpoint) —
    * unlike greedy bin packing, which needs sequential state.
    *
    * Output: one row per (doc, chunk_idx) with paragraphs rejoined by
    * a blank line; other columns pass through. */
  def chunkByParagraphs(df: DataFrame, textCol: String,
      maxTokens: Int): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    val assigned =
      graft.expr.sketchFunctions.paragraph_chunks(col(textCol), maxTokens)
    val origCols = df.columns.toIndexedSeq
    df.withColumn("__assigned", assigned)
      .select(col("*"), posexplode(col("__assigned")).as(Seq("__pos", "__a")))
      .groupBy(origCols.map(col) :+ col("__a.chunk_idx").as("chunk_idx"): _*)
      // collect_list order is not shuffle-stable — carry the paragraph
      // ordinal and sort before joining
      .agg(concat_ws("\n\n", transform(
        array_sort(collect_list(struct(col("__pos"), col("__a.para").as("para")))),
        s => s.getField("para"))).as("chunk_text"))
  }
}
