package graft.ops

import org.apache.spark.ml.feature.{HashingTF, IDF, Normalizer, RegexTokenizer}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding generation with Spark MLlib (BASELINE.json north star:
  * "DataFrame-based document processing + MLlib for embeddings").
  *
  * TF-IDF document vectors: RegexTokenizer → HashingTF (fixed feature
  * dim, hashing trick — no vocabulary state to ship) → IDF (one fit pass)
  * → L2 Normalizer, so downstream cosine = dot product. Deterministic:
  * hashing is seedless murmur3 on terms, IDF weights derive from corpus
  * statistics alone. A real deployment swaps this estimator chain for a
  * neural encoder behind the same (id, embedding) contract the ANN
  * operators ([[Vectors]], [[Dedup.embeddingNearDups]]) consume.
  */
object TfIdfEmbed {

  /** Fit + transform: returns (idCol, embedding array<float>, norm'd). */
  def embed(df: DataFrame, idCol: String, textCol: String,
      dim: Int = 256): DataFrame = {
    val tok = new RegexTokenizer().setInputCol(textCol).setOutputCol("__tokens")
      .setPattern("\\s+")
    val tf = new HashingTF().setInputCol("__tokens").setOutputCol("__tf")
      .setNumFeatures(dim)
    val tokenized = tf.transform(tok.transform(df))
    val idf = new IDF().setInputCol("__tf").setOutputCol("__tfidf").fit(tokenized)
    val norm = new Normalizer().setInputCol("__tfidf").setOutputCol("__vec").setP(2.0)
    val out = norm.transform(idf.transform(tokenized))
    val spark = df.sparkSession
    val toFloats = udf((v: Vector) => v.toArray.map(_.toFloat))
    out.select(col(idCol), toFloats(col("__vec")).as("embedding"))
  }
}
