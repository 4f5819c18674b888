package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analytics for corpus curation (builder-prompt extension family):
  * token statistics, quality scoring, language identification. All pure
  * column compositions (codegen'd, oracle-checkable); the stateful
  * fingerprinting lives in [[Sketches]].
  *
  * Determinism notes for the DuckDB oracle: ratios are single double
  * divisions of exact integers, composite scores are floored to integers —
  * both engines produce bit-identical doubles for the same expression
  * order.
  */
object TextAnalysis {

  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Common-word markers per language for the n-gram/stopword heuristic.
    * Bounded, case-sensitive, order matters for the argmax tie-break. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "is", "of"),
    "de" -> Seq("der", "und", "ist", "das"),
    "es" -> Seq("el", "los", "es", "de"),
    "fr" -> Seq("le", "les", "est", "et"),
    "zh" -> Seq("的", "是", "在", "了"))

  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "on", "for")

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(typedlit(words), t)))

  /** Marker-count score for one language. */
  def langScore(text: Column, lang: String): Column = {
    val markers = langMarkers.toMap.apply(lang)
    countIn(tokens(text), markers)
  }

  /** Predicted language: argmax of marker counts with first-listed-wins
    * tie-break; "und" (undetermined) when every score is zero. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = langMarkers.map { case (l, ws) => l -> countIn(toks, ws) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.reverse.foldLeft(lit("und")) { case (acc, (l, s)) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
    pick
  }

  /** GPT-2-style pre-tokenizer pieces, minus the trailing-space lookahead
    * (RE2 has no lookahead, and the DuckDB oracle runs RE2): contractions,
    * space-prefixed letter/digit runs, punctuation runs, whitespace runs.
    * Leftmost-first alternation in both engines ⇒ identical piece counts. */
  val bpePieceRegex: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** Token statistics: whitespace total / distinct / alphanumeric-run /
    * BPE-ish piece counts. */
  def tokenStats(text: Column): Seq[Column] = {
    val toks = tokens(text)
    Seq(
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_uniq"),
      regexp_count(text, lit("[A-Za-z0-9]+")).as("n_alpha"),
      regexp_count(text, lit(bpePieceRegex)).as("n_bpe"))
  }

  /** Repetition signals per document (the Gopher-style duplicate-n-gram
    * quality filters): for each doc with at least one n-gram, the total /
    * distinct gram counts, the count of the single most frequent gram,
    * and the mass sitting in duplicated grams. `top_frac` high ⇒ one
    * phrase dominates (boilerplate); `dup_frac` high ⇒ looped text.
    *
    * Relational shape on purpose: explode → two-level aggregate, so the
    * per-gram count gets map-side partial aggregation and the whole thing
    * is two hash shuffles regardless of document length — the columnar
    * alternative (per-row lambda over distinct grams) is O(n²) per row in
    * interpreted HOF calls. */
  def repetitionStats(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, n: Int = 2): org.apache.spark.sql.DataFrame = {
    // materialize the token array as an attribute FIRST: higher-order
    // lambdas are interpreted and re-evaluate non-argument subtrees per
    // element, so an inlined split() would run O(tokens) times per row
    val toks = df.select(col(idCol), tokens(col(textCol)).as("__w"))
    val w = col("__w")
    val grams = when(size(w) >= n,
      transform(sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(w, i + o)): _*)))
      .otherwise(array().cast("array<string>"))
    toks.select(col(idCol), explode(grams).as("gram"))
      .groupBy(col(idCol), col("gram")).agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol)).agg(
        sum("cnt").as("n_grams"),
        count(lit(1)).as("n_distinct"),
        max("cnt").as("top_cnt"),
        coalesce(sum(when(col("cnt") > 1, col("cnt"))), lit(0L)).as("dup_cnt"))
      .select(col(idCol),
        col("n_grams"), col("n_distinct"), col("top_cnt"), col("dup_cnt"),
        (col("top_cnt").cast("double") / col("n_grams").cast("double")).as("top_frac"),
        (col("dup_cnt").cast("double") / col("n_grams").cast("double")).as("dup_frac"))
  }

  /** Quality score in [0,100]: lexical diversity (70%) + stopword
    * presence (30%) — floored to an integer for engine-exact compare.
    * High diversity and a natural stopword rate indicate prose; word-salad
    * and boilerplate score low on one of the two. */
  def qualityScore(text: Column): Seq[Column] = {
    val toks = tokens(text)
    val n = size(toks)
    val uniq = size(array_distinct(toks))
    val stop = countIn(toks, stopwords)
    val score = floor(lit(100) * (lit(0.7) * (uniq.cast("double") / n.cast("double")) +
      lit(0.3) * (stop.cast("double") / n.cast("double")))).cast("long")
    Seq(n.as("n_tokens"), uniq.as("n_uniq"), stop.as("n_stop"),
      score.as("q_score"))
  }
}
