package graft.ops

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{HashingTF, IDF, RegexTokenizer}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the FineWeb / DCLM curation pattern:
  * take a cheap WEAK label (here any rule gate, e.g.
  * [[TextAnalysis.gopherFlags]]'s verdict or an LLM-graded seed set),
  * train a linear classifier over TF-IDF features, then score the whole
  * corpus with a calibrated probability that survives as a ranking /
  * thresholding signal. The classifier generalizes past the rules that
  * seeded it — the rules fire on hard counts, the model scores every
  * document smoothly.
  *
  * Spark-first shape: the feature chain is the [[TfIdfEmbed]] estimator
  * stack (tokenize → hashing-trick TF → IDF), the model is MLlib
  * LogisticRegression (L-BFGS), and scoring is ONE map-shaped transform
  * over the corpus — at 100 TB the fit runs on a bounded labeled sample
  * (`fitSampleRows`) while the transform streams the full corpus, which
  * is exactly how production quality classifiers deploy (fastText-style
  * linear model, corpus-wide inference).
  *
  * Determinism: tokenizer/TF/IDF are seedless and corpus-deterministic;
  * L-BFGS is deterministic for a fixed partitioning of the fit sample —
  * the sample is taken by md5 order (content-addressed, like
  * [[Sampling.samplePerStratum]]) and coalesced to one partition, so the
  * fit sees bit-identical aggregates run-to-run.
  */
object QualityClassifier {

  /** Scored corpus plus the model-application artifacts that let an
    * external engine REPLAY the scoring layer: `features` is the exact
    * per-doc sparse TF-IDF the transform consumed (one row per active
    * index), `coefficients`/`intercept` the fitted linear model. The
    * margin is Σ w(idx)·v(idx) + b accumulated in ascending-index order
    * (BLAS sparse-dense dot), so an order-preserving SQL inner product
    * reproduces it bit-for-bit. */
  final case class Scored(scored: DataFrame, features: DataFrame,
      coefficients: Array[Double], intercept: Double)

  /** Train on `labelCol` (0/1) over a bounded md5-ordered sample, score
    * every row. Output: (idCol, label, margin_micro, prob_milli, pred)
    * where margin_micro = floor(10⁶·(w·x + b)), prob_milli =
    * floor(1000·P(label=1)) and pred = P ≥ 0.5 (≡ margin ≥ 0).
    *
    * margin_micro is the CROSS-ENGINE-STABLE score: the margin is a pure
    * ordered float dot (bit-reproducible anywhere), while the sigmoid
    * behind prob_milli runs through exp(), which is not correctly
    * rounded — a margin within ~1 ulp of a milli boundary could floor
    * differently on another engine. Oracles compare margin_micro;
    * prob_milli stays for human-readable thresholding. */
  def trainScore(df: DataFrame, idCol: String, textCol: String,
      labelCol: String, dim: Int = 256, fitSampleRows: Int = 100000,
      regParam: Double = 0.01, maxIter: Int = 25): DataFrame =
    trainScoreFull(df, idCol, textCol, labelCol, dim, fitSampleRows,
      regParam, maxIter).scored

  /** [[trainScore]] plus replay artifacts — see [[Scored]]. */
  def trainScoreFull(df: DataFrame, idCol: String, textCol: String,
      labelCol: String, dim: Int = 256, fitSampleRows: Int = 100000,
      regParam: Double = 0.01, maxIter: Int = 25): Scored = {
    val tok = new RegexTokenizer().setInputCol(textCol).setOutputCol("__tokens")
      .setPattern("\\s+")
    val tf = new HashingTF().setInputCol("__tokens").setOutputCol("__tf")
      .setNumFeatures(dim)
    val featured0 = tf.transform(tok.transform(df))
      .select(col(idCol), col(labelCol).cast("double").as("__label"), col("__tf"))
    val featured = featured0.persist()
    val idf = new IDF().setInputCol("__tf").setOutputCol("__feat").fit(featured)
    val feats = idf.transform(featured)
    // bounded, content-ordered, single-partition fit sample: the same
    // rows in the same order every run ⇒ identical L-BFGS trajectory
    val fitSet = feats.orderBy(md5(col(idCol).cast("string")))
      .limit(fitSampleRows).coalesce(1)
    val lr = new LogisticRegression().setFeaturesCol("__feat")
      .setLabelCol("__label").setRegParam(regParam).setMaxIter(maxIter)
    val model = lr.fit(fitSet)
    val p1 = udf((v: Vector) => v(1))
    // `featured` stays cached for the lazy corpus-wide transform (the
    // fit pass above materialized it); caller / clearCache releases it —
    // same cache contract as [[TfIdfEmbed.embed]]
    // rawPrediction(1) IS the margin w·x + b exactly as BLAS accumulated
    // it (ascending index, intercept last) — no inverse-sigmoid round trip
    val scored = model.transform(feats)
      .select(col(idCol), col("__label").cast("long").as("label"),
        floor(lit(1000000.0) * p1(col("rawPrediction"))).cast("long")
          .as("margin_micro"),
        floor(lit(1000) * p1(col("probability"))).cast("long").as("prob_milli"))
      // margin-based (≡ P ≥ 0.5 mathematically, but decided by exact
      // float comparison rather than through the sigmoid's exp())
      .withColumn("pred", col("margin_micro") >= 0)
    val activeUdf = udf((v: Vector) => {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
      // explicit zeros contribute exactly 0.0 to the dot; skipping them
      // preserves the accumulated sum bit-for-bit
      v.foreachActive((i, x) => if (x != 0.0) out += ((i, x)))
      out.toSeq
    })
    val featureRows = feats
      .select(col(idCol), explode(activeUdf(col("__feat"))).as("e"))
      .select(col(idCol), col("e._1").as("idx"), col("e._2").as("v"))
    Scored(scored, featureRows, model.coefficients.toArray, model.intercept)
  }
}
