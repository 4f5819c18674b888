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
    val paras = filter(
      transform(split(col(textCol), "\\n{2,}"), p => trim(p)),
      p => length(p) > 0)
    val counts = transform(paras, p => size(split(p, "\\s+")))
    // exclusive running sum of token counts per paragraph
    val offsets = slice(
      aggregate(counts, array(lit(0)),
        (acc, x) => concat(acc, array(element_at(acc, -1) + x))),
      lit(1), size(counts))
    val assigned = zip_with(paras, offsets,
      (p, off) => struct(floor(off / maxTokens).cast("int").as("chunk_idx"), p.as("para")))
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
