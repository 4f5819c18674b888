package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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

  /** Mixed-language detection — [[langId]] applied per SENTENCE segment
    * and rolled up per document: segment count, distinct predicted
    * languages, the dominant language (ties broken lexicographically via
    * a deterministic rank) and its share in milli-units (integer
    * division — engine-exact). Code-switching and boilerplate-in-a-
    * second-language are invisible to document-level language ID; the
    * per-segment histogram is the standard detector. Explode is bounded
    * by sentences×docs; two hash aggregates + one doc-keyed window over
    * the (doc, lang) counts — the window input is already shrunk to at
    * most |langs|+1 rows per doc, so the sort inside each partition is
    * trivial. */
  def langMix(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val segs = df
      .select(col(idCol), explode(split(col(textCol), "[.!?]+")).as("seg"))
      .filter(length(trim(col("seg"))) > 0)
      .select(col(idCol), langId(col("seg")).as("seg_lang"))
    val counts = segs.groupBy(col(idCol), col("seg_lang"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("n").desc, col("seg_lang").asc)
    counts.withColumn("rk", row_number().over(w))
      .groupBy(col(idCol))
      .agg(sum("n").as("n_segments"),
        count(lit(1)).as("n_langs"),
        max(when(col("rk") === 1, col("seg_lang"))).as("lang_dominant"),
        max(when(col("rk") === 1, col("n"))).as("__n_dom"))
      .withColumn("dominant_milli",
        expr("__n_dom * 1000L div n_segments"))
      .drop("__n_dom")
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

  /** Corpus NOVELTY per document — the uniqueness/memorization-risk
    * curation signal: the fraction of a document's distinct 3-token
    * shingles that appear in NO other document. Near-1 ⇒ the document
    * contributes unique text; near-0 ⇒ it restates what the corpus
    * already holds (near-dup tail, heavy quotation) and adds little
    * training signal — the inverse of what the dedup families flag, as
    * a per-doc score instead of pair output.
    *
    * Shape: one explode of per-doc DISTINCT shingles (so the per-gram
    * count IS document frequency), a partial-aggregated shuffle keyed on
    * the gram, one join back, one per-doc aggregate. String grams keep
    * the score oracle-replayable at test scale; a corpus deployment
    * swaps in the 64-bit gram-hash kernel ([[graft.ops.Sketches]]) like
    * the winnowing family. Docs under 3 tokens score 0 of 0 grams. */
  def noveltyScore(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    // distinct space-split trigrams — exactly the TokenShinglesExpr
    // kernel contract (empties kept, first-occurrence-distinct)
    val grams = df.select(col(idCol), explode(
      graft.expr.sketchFunctions.token_shingles(col(textCol), 3)).as("__g"))
    val dfreq = grams.groupBy("__g").agg(count(lit(1)).as("__df"))
    val perDoc = grams.join(dfreq, Seq("__g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__df") === 1, 1L).otherwise(0L)).as("n_unique"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"))
      .withColumn("novelty_milli",
        when(col("n_grams") > 0,
          floor(lit(1000) * col("n_unique") / col("n_grams")))
          .otherwise(lit(0)).cast("long"))
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
    // grams from the one-pass codegen kernel (SlidingGramsExpr) — the
    // former transform(sequence(...)) spelling interpreted its lambdas
    // per gram (CodegenFallback)
    df.select(col(idCol),
        explode(graft.expr.sketchFunctions.sliding_grams(col(textCol), n))
          .as("gram"))
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

  /** Character-level Shannon entropy per document — the "is this even
    * text" quality gate (random bytes ≈ uniform entropy, templated
    * boilerplate ≈ very low; natural prose sits in a narrow band).
    *
    * Relational shape: explode chars → (id, ch) count with map-side
    * partial aggregation (compresses to ≤|alphabet| rows per doc per
    * partition — the shuffle carries alphabet-sized groups, not the
    * text), then ONE per-doc fold. The double summation is over the
    * char-sorted count array via a sequential `aggregate` lambda, so
    * the add order is deterministic and matches the oracle's
    * `sum(... ORDER BY ch)` bit-for-bit; the result ships as floored
    * milli-nats (BIGINT) so the driver compare never sees a
    * non-reproducible double.
    *
    * H = ln(N) − (Σ c·ln c)/N over per-char counts c, N = total chars. */
  def charEntropy(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val counts = df
      .select(col(idCol), explode(split(col(textCol), "")).as("ch"))
      .filter(length(col("ch")) > 0) // Java split keeps a trailing ""
      .groupBy(col(idCol), col("ch")).agg(count(lit(1)).as("cnt"))
    counts.groupBy(col(idCol))
      .agg(sum("cnt").as("n_chars_tot"),
        sort_array(collect_list(struct(col("ch"), col("cnt")))).as("__cs"))
      .select(col(idCol), col("n_chars_tot"),
        floor(lit(1000) * (log(col("n_chars_tot").cast("double")) -
          aggregate(col("__cs"), lit(0.0), (acc, x) =>
            acc + x.getField("cnt").cast("double") *
              log(x.getField("cnt").cast("double"))) /
            col("n_chars_tot").cast("double")))
          .cast("long").as("entropy_milli"))
  }

  /** Flesch reading-ease quality tagger (Flesch 1948), engine-portable:
    * words are \S+ runs, sentences are [.!?]+ runs (floored at 1 so
    * fragments don't divide by zero), syllables approximated as vowel
    * groups `[aeiouy]+` of the lowercased text — the standard cheap
    * estimator; all three are regexp counts, so the scan stays one
    * codegen'd projection. Score floored to milli-units AFTER the double
    * arithmetic: both engines build the same doubles from the same
    * integers and the same literals, so the floor is bit-identical.
    * 206.835 − 1.015·(W/S) − 84.6·(Y/W); higher = simpler text. */
  def fleschMilli(text: Column): Seq[Column] = {
    val w = greatest(lit(1L), regexp_count(text, lit("\\S+")).cast("long"))
    val s = greatest(lit(1L), regexp_count(text, lit("[.!?]+")).cast("long"))
    val y = regexp_count(lower(text), lit("[aeiouy]+")).cast("long")
    Seq(w.as("n_words"), s.as("n_sentences"), y.as("n_syllables"),
      floor(lit(1000.0) * (lit(206.835)
        - lit(1.015) * w.cast("double") / s.cast("double")
        - lit(84.6) * y.cast("double") / w.cast("double")))
        .cast("long").as("flesch_milli"))
  }

  /** Corpus vocabulary: per-token term count + document frequency, top-k
    * by (count desc, token asc). The deterministic tie-break makes the
    * cut reproducible; `orderBy+limit` plans as TakeOrderedAndProject
    * (per-partition heaps merged on the driver), so no single-partition
    * global sort exists even when the vocabulary is 10⁸ tokens. */
  def vocabTopK(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int): org.apache.spark.sql.DataFrame =
    df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token")
      .agg(count(lit(1)).as("term_cnt"),
        count_distinct(col(idCol)).as("doc_freq"))
      .orderBy(col("term_cnt").desc, col("token").asc)
      .limit(k)

  /** Cumulative corpus-coverage curve of the top-k vocabulary — "how
    * many distinct tokens cover 95% of all occurrences", the sizing
    * input for a tokenizer vocab or frequency cutoff. The running sum
    * windows over only the k surviving rows (top-k is taken FIRST, as a
    * TakeOrderedAndProject — the single-partition window never sees the
    * full vocabulary); the grand total rides in on a one-row broadcast.
    * Coverage ships as floored milli-units of an exact-integer division,
    * the usual compare-stable form. */
  def vocabCoverage(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    // MATERIALIZED when a re-scan is costly (see cutIfRescanCostly):
    // counts feeds both the grand total and the top-k probe — left
    // lazy, the second reference re-tokenizes the whole corpus.
    // Vocabulary-sized and narrow (token, count): far smaller than the
    // token stream it replaces.
    val counts = ScaleHints.cutIfRescanCostly(
      df.select(explode(tokens(col(textCol))).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy("token").agg(count(lit(1)).as("term_cnt")),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val total = counts.agg(sum(col("term_cnt")).as("__tot"))
    val order = Seq(col("term_cnt").desc, col("token").asc)
    val w = Window.orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts.orderBy(order: _*).limit(k)
      .crossJoin(broadcast(total))
      .select(
        row_number().over(Window.orderBy(order: _*)).cast("long").as("rank"),
        col("token"), col("term_cnt"),
        floor(lit(1000) * sum(col("term_cnt")).over(w).cast("double") /
          col("__tot").cast("double")).cast("long").as("cum_cov_milli"))
  }

  /** Pointwise mutual information over adjacent-token bigrams — the
    * collocation signal (corpus phrase mining / tokenizer-merge
    * candidates). Bigram and unigram counts are exact global aggregates
    * (both partial-agg friendly: the shuffle carries vocabulary-sized
    * groups); the PMI double is computed with an identical expression
    * tree on both engines from those exact integers and shipped as
    * floored milli-nats.
    *
    * pmi = ln c_xy − ln c_x − ln c_y + 2·ln N_uni − ln N_bi. */
  def bigramPmi(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, topK: Int): org.apache.spark.sql.DataFrame = {
    // bigrams from the codegen kernel; tokens contain no spaces, so the
    // "w1 w2" gram splits back exactly on its single separator
    val toks = df.select(col(idCol), tokens(col(textCol)).as("__w"))
    val bi = df.select(explode(
        graft.expr.sketchFunctions.sliding_grams(col(textCol), 2)).as("g"))
      .select(substring_index(col("g"), " ", 1).as("w1"),
        substring_index(col("g"), " ", -1).as("w2"))
    // MATERIALIZED when a re-scan is costly (see cutIfRescanCostly):
    // uni feeds the total and both per-word joins (3 references), biCnt
    // the total and the main chain (2) — left lazy, the corpus is
    // re-tokenized five times. Both are vocabulary-sized counts, far
    // smaller than the token streams they summarize.
    val uni = ScaleHints.cutIfRescanCostly(
      toks.select(explode(col("__w")).as("tk"))
        .groupBy("tk").agg(count(lit(1)).as("c")),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val biCnt = ScaleHints.cutIfRescanCostly(
      bi.groupBy("w1", "w2").agg(count(lit(1)).as("c_xy")),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val totals = uni.agg(sum("c").as("n_uni"))
      .crossJoin(biCnt.agg(sum("c_xy").as("n_bi")))
    val d = (c: Column) => c.cast("double")
    biCnt
      .join(uni.select(col("tk").as("w1"), col("c").as("c_x")), Seq("w1"))
      .join(uni.select(col("tk").as("w2"), col("c").as("c_y")), Seq("w2"))
      .crossJoin(totals)
      .select(col("w1"), col("w2"), col("c_xy"), col("c_x"), col("c_y"),
        floor(lit(1000) * (log(d(col("c_xy"))) - log(d(col("c_x"))) -
          log(d(col("c_y"))) + lit(2) * log(d(col("n_uni"))) -
          log(d(col("n_bi"))))).cast("long").as("pmi_milli"))
      .orderBy(col("c_xy").desc, col("w1").asc, col("w2").asc)
      .limit(topK)
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

  /** Gopher-style rule gate (Rae et al. 2021 §A1.1, "Scaling Language
    * Models: … Gopher" — the standard pre-training quality rules): word
    * count bounds, mean word length band, alphabetic-word ratio,
    * stop-word evidence. Every ratio threshold is cross-multiplied into
    * INTEGER arithmetic (3 ≤ mean ≤ 10 becomes 3·n ≤ chars ≤ 10·n;
    * alpha/n ≥ 0.8 becomes 5·alpha ≥ 4·n), so flags are engine-exact —
    * no float compare can flip at a boundary. The symbol-ratio and
    * bullet/ellipsis line rules from the paper degenerate on a
    * single-line corpus and are folded into the alpha-ratio rule here.
    *
    * Pure per-row projection: no shuffle, fully codegen'd, and as a
    * pre-filter it cuts the corpus BEFORE any expensive dedup/embedding
    * stage touches it — the cheapest FLOP you never spend at 100 TB.
    */
  def gopherFlags(text: Column, minWords: Int = 50, maxWords: Int = 100000):
      Seq[Column] = {
    val ts = tokens(text)
    val n = size(ts).cast("long")
    // total in-word chars == chars left after deleting all whitespace —
    // stays in codegen instead of an interpreted HOF fold over tokens
    val chars = length(regexp_replace(trim(text), "\\s+", "")).cast("long")
    val alpha = size(filter(ts, t => t.rlike("[a-z]"))).cast("long")
    val stop = countIn(ts, stopwords).cast("long")
    val okCount = n >= minWords && n <= maxWords
    val okMeanLen = lit(3) * n <= chars && chars <= lit(10) * n
    val okAlpha = lit(5) * alpha >= lit(4) * n
    val okStop = stop >= 2
    Seq(n.as("n_words"), chars.as("n_word_chars"),
      alpha.as("n_alpha_words"), stop.as("n_stop_words"),
      okCount.as("ok_word_count"), okMeanLen.as("ok_mean_word_len"),
      okAlpha.as("ok_alpha_ratio"), okStop.as("ok_stopwords"),
      (okCount && okMeanLen && okAlpha && okStop).as("gopher_pass"))
  }

  /** Corpus-trained bigram language-model score per document — the
    * perplexity-style quality signal (a KenLM stand-in trained on the
    * corpus itself): documents whose adjacent-token transitions are
    * improbable under the corpus's own bigram statistics are word salad
    * or boilerplate; probable transitions are fluent text.
    *
    * Per bigram occurrence, add-½-smoothed conditional probability
    * P(w2|w1) = (c(w1,w2) + ½) / (c(w1) + ½·V) = (2·c12 + 1) / (2·c1 + V),
    * scored as floor(1000 · ln P) — a per-row double expression over
    * EXACT global integers (same trick as [[bigramPmi]]), so the milli-nat
    * is engine-identical; the per-document total is then an INTEGER sum,
    * order-independent by construction (a double sum would depend on
    * partition arrival order).
    *
    * Shuffle shape: unigram/bigram counts are vocabulary-sized partial
    * aggs; the occurrence→stats join keys on (w1, w2) against the
    * bigram-level stats table (broadcast when small); one final shuffle
    * groups by document. Scales linearly in corpus tokens.
    */
  def lmScore(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    import ScaleHints.maybeBroadcast
    val toks = df.select(col(idCol), tokens(col(textCol)).as("__w"))
    // bigrams from the codegen kernel (tokens contain no spaces, so the
    // gram splits back exactly on its single separator)
    val occ = df.select(col(idCol), explode(
        graft.expr.sketchFunctions.sliding_grams(col(textCol), 2)).as("g"))
      .select(col(idCol), substring_index(col("g"), " ", 1).as("w1"),
        substring_index(col("g"), " ", -1).as("w2"))
    // MATERIALIZED when a re-scan is costly (see cutIfRescanCostly):
    // uni feeds the vocab count and the stats join — left lazy, the
    // corpus is tokenized twice more.
    val uni = ScaleHints.cutIfRescanCostly(
      toks.select(explode(col("__w")).as("tk"))
        .groupBy("tk").agg(count(lit(1)).as("c1")),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val vocab = uni.agg(count(lit(1)).as("v"))
    val stats = occ.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .join(uni.select(col("tk").as("w1"), col("c1")), Seq("w1"))
      .crossJoin(vocab)
    val lpMilli = floor(lit(1000) * (
      log((lit(2) * col("c12") + 1).cast("double")) -
        log((lit(2) * col("c1") + col("v")).cast("double")))).cast("long")
    occ.join(maybeBroadcast(stats), Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(lpMilli).cast("long").as("lp_milli_sum"))
  }

  /** Compression-ratio repetition signal: zlib-deflated length over raw
    * UTF-8 length, in milli-units. Template/spam/machine-generated text
    * deflates far below prose (RefinedWeb and Dolma gate on exactly this
    * one-pass signal), and unlike n-gram counting it needs no shuffle —
    * a narrow codegen'd map over the scan, so at 100 TB it costs one
    * read. No SQL engine expresses deflate, so the query is rows-only;
    * kernel behavior is pinned against a reference Deflater in
    * SketchesSpec. */
  def compressionStats(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val nb = octet_length(col(textCol)).cast("long")
    val dl = graft.expr.sketchFunctions.deflate_len(col(textCol))
    df.select(col(idCol), nb.as("n_bytes"), dl.as("deflate_bytes"),
      when(nb > 0, floor(lit(1000) * dl / nb)).otherwise(lit(0))
        .cast("long").as("ratio_milli"))
  }

  /** RAKE keyphrase extraction (Rose et al. 2010): candidate phrases =
    * maximal stopword/punctuation-free runs; word score = degree/freq
    * over the document's phrase set (degree = Σ phrase length per
    * occurrence — co-occurring words boost each other); phrase score =
    * Σ word scores; top-`k` phrases per document.
    *
    * Engine-exact integer variant: word score floored to milli BEFORE
    * the phrase sum, ties by phrase text. Phrase SET semantics — a
    * phrase repeated verbatim in one document scores once (dedup before
    * the stats pass), which keeps the replay positional-index-free.
    *
    * Scale shape: two explodes and two aggregates, all keyed on
    * (doc_id[, word/phrase]) — per-document work is bounded by document
    * length, nothing global. The stopword delimiter set is
    * [[stopwords]] (bounded, compiled into one regex alternation).
    * Output: (doc_id, rank, phrase, score_milli). */
  def rakeKeyphrases(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    val stopRe = "\\b(" + stopwords.mkString("|") + ")\\b"
    val delimited = regexp_replace(
      regexp_replace(lower(col(textCol)), stopRe, "|"), "[.,;:!?()]", "|")
    val phrases = df
      .select(col(idCol).as("doc_id"),
        explode(split(delimited, "\\|+")).as("__p"))
      .select(col("doc_id"), trim(col("__p")).as("phrase"))
      .filter(col("phrase") =!= "").distinct()
    val toks = phrases
      .withColumn("__w", split(col("phrase"), "\\s+"))
      .select(col("doc_id"), col("phrase"),
        explode(col("__w")).as("word"), size(col("__w")).as("plen"))
    val wstats = toks.groupBy("doc_id", "word")
      .agg(count(lit(1)).as("freq"), sum("plen").as("deg"))
      .withColumn("wscore_milli", expr("1000 * deg div freq"))
    val scored = toks.join(wstats.select("doc_id", "word", "wscore_milli"),
        Seq("doc_id", "word"))
      .groupBy("doc_id", "phrase")
      .agg(sum("wscore_milli").cast("long").as("score_milli"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score_milli").desc, col("phrase").asc)
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select("doc_id", "rank", "phrase", "score_milli")
  }
}
