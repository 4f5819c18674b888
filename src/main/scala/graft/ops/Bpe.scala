package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING + corpus-wide encode — the
  * tokenizer-fitting step of a training-data pipeline (Sennrich et al.
  * 2016; the GPT-2/BERT vocabulary construction).
  *
  * Scale shape: the fit consumes the corpus only through its WORD
  * FREQUENCY dictionary — one distributed explode + count whose output is
  * bounded by vocabulary size, not corpus size (a 100 TB crawl has a
  * dictionary in the tens of millions; `maxVocab` caps the tail). Merge
  * learning then runs driver-side over that dictionary — the standard
  * shape (HuggingFace/SentencePiece train exactly this way: corpus pass
  * for counts, local merge loop). Encoding is a per-row JVM kernel
  * ([[graft.expr.BpeEncodeExpr]], codegen'd) — one map pass, no shuffle.
  *
  * Determinism: the dictionary is exact global counts; ties in the merge
  * argmax break lexicographically; the model is a pure function of the
  * corpus. Refitting yields byte-identical merges.
  */
object Bpe {

  /** Learned merge list, in application order. `ranks` maps a symbol
    * pair to its merge priority (lower = earlier-learned = applied
    * first during encode, exactly like GPT-2's bpe_ranks). */
  final case class BpeModel(merges: List[(String, String)]) {
    lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
  }

  /** End-of-word marker (classic </w> spelling): lets a merged piece
    * distinguish "low" the word from "low" the prefix of "lower". */
  val EndOfWord = "</w>"

  /** UTF-8 binary collation — the collation of Spark SQL's default
    * string ORDER BY (UTF8String compares bytewise). Differs from Java's
    * `String.compareTo` (UTF-16 code units) exactly when one side
    * contains a supplementary-plane code point (surrogate pair sorts
    * BELOW U+E000..U+FFFF under UTF-16, above under UTF-8/code-point
    * order). Used for merge-argmax tie-breaks so [[fit]] and
    * [[fitDistributed]] stay byte-identical on any text. */
  private[ops] def utf8Compare(x: String, y: String): Int = {
    var i = 0; var j = 0
    while (i < x.length && j < y.length) {
      val cx = x.codePointAt(i); val cy = y.codePointAt(j)
      if (cx != cy) return Integer.compare(cx, cy)
      i += Character.charCount(cx); j += Character.charCount(cy)
    }
    Integer.compare(x.length - i, y.length - j)
  }

  /** Initial symbols of a word: one per Unicode CODE POINT, not UTF-16
    * code unit — a char-level split would tear supplementary characters
    * (emoji, math alphanumerics) into unpaired surrogates that
    * UTF8String later mangles into replacement bytes. */
  private[ops] def symbolsOf(w: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result() :+ EndOfWord
  }

  /** Learn `nMerges` merges from the corpus word-frequency dictionary.
    * `maxVocab` bounds the dictionary rows collected to the driver
    * (most-frequent-first, then lexicographic — deterministic cut). */
  def fit(df: DataFrame, textCol: String, nMerges: Int,
      maxVocab: Int = 100000): BpeModel =
    fitWithStates(df, textCol, nMerges, maxVocab)._1

  /** [[fit]] plus the per-iteration vocab states — state t is the symbol
    * table BEFORE merge t, one `(word, space-joined symbols, count)` row
    * per dictionary word. This is the `text_bpe_fit` oracle trace:
    * SparkEntry.writeOracleAux exports it and DuckDB RE-DERIVES every
    * merge itself as the argmax over state t's pair counts (count DESC,
    * then byte-order a, b — the same collation as [[utf8Compare]]) and
    * re-proves state t+1 == rewrite(state t, merge t) plus state 0 ==
    * the corpus dictionary, so the merges the oracle compares against
    * are computed independently; the trace supplies only intermediate
    * state, every row of which is verified. [[fit]] delegates here —
    * one loop, no drift. Symbols never contain whitespace (words come
    * from whitespace tokenization), so the space join is unambiguous. */
  def fitWithStates(df: DataFrame, textCol: String, nMerges: Int,
      maxVocab: Int = 100000): (BpeModel, Vector[Vector[(String, String, Long)]]) = {
    val dict: Array[(String, Long)] = df
      .select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    // word → symbol sequence (chars + </w>), weighted by frequency
    var vocab: Vector[(String, Vector[String], Long)] = dict.toVector.map {
      case (w, c) => (w, symbolsOf(w), c)
    }
    val merges = List.newBuilder[(String, String)]
    val states = Vector.newBuilder[Vector[(String, String, Long)]]
    var i = 0
    var exhausted = false
    while (i < nMerges && !exhausted) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (_, syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          counts(p) = counts.getOrElse(p, 0L) + c
          j += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        states += vocab.map { case (w, syms, c) => (w, syms.mkString(" "), c) }
        // argmax count, ties broken lexicographically in UTF-8 BYTE order
        // (= code-point order) — the same collation Spark SQL's string
        // ORDER BY uses in [[fitDistributed]], so the two fits agree on
        // exact-count ties even for supplementary-plane symbols (Java
        // String ordering would sort surrogates below U+E000..U+FFFF)
        var best = counts.head._1
        var bestC = counts.head._2
        counts.foreach { case (p, c) =>
          if (c > bestC || (c == bestC && {
            val ca = utf8Compare(p._1, best._1)
            ca < 0 || (ca == 0 && utf8Compare(p._2, best._2) < 0)
          })) { best = p; bestC = c }
        }
        merges += best
        val joined = best._1 + best._2
        vocab = vocab.map { case (w, syms, c) =>
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == best._1 && syms(j + 1) == best._2) {
              out += joined; j += 2
            } else { out += syms(j); j += 1 }
          }
          (w, out.result(), c)
        }
        i += 1
      }
    }
    (BpeModel(merges.result()), states.result())
  }

  /** Distributed-pair-count fit: byte-identical merges to [[fit]], with
    * each iteration's pair count run as a Spark aggregation instead of a
    * driver loop — the path when the word dictionary itself outgrows
    * driver memory (a multilingual 100 TB crawl). Driver state per
    * iteration is ONE row (the argmax pair); the dictionary stays a
    * DataFrame end to end, lineage cut by localCheckpoint every 10
    * merges so the 50-iteration plan never deepens unboundedly.
    *
    * Same determinism contract as [[fit]]: exact weighted counts,
    * argmax ties broken lexicographically (ORDER BY n DESC, a, b),
    * left-to-right non-overlapping merge application. The udfs are
    * justified: code-point symbol split and adjacent-pair rewrite are
    * per-element stateful array transforms with no Column-function form.
    */
  def fitDistributed(df: DataFrame, textCol: String, nMerges: Int,
      maxVocab: Int = 100000): BpeModel = {
    val mergeUdf = udf { (syms: Seq[String], a: String, b: String) =>
      val out = Vector.newBuilder[String]
      var j = 0
      while (j < syms.length) {
        if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
          out += (a + b); j += 2
        } else { out += syms(j); j += 1 }
      }
      out.result()
    }
    val symsUdf = udf((w: String) => symbolsOf(w))
    var vocab = df.select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc).limit(maxVocab)
      .select(symsUdf(col("w")).as("syms"), col("c"))
      .persist()
    vocab.count()

    val merges = List.newBuilder[(String, String)]
    var i = 0
    var exhausted = false
    while (i < nMerges && !exhausted) {
      val best = vocab.filter(size(col("syms")) > 1)
        .select(col("c"), explode(expr(
          "transform(sequence(0, size(syms)-2), j -> struct(syms[j] AS a, syms[j+1] AS b))"))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("c")).as("n"))
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += ((a, b))
        val next = vocab
          .select(mergeUdf(col("syms"), lit(a), lit(b)).as("syms"), col("c"))
          .persist()
        next.count()
        vocab.unpersist()
        vocab =
          if ((i + 1) % 10 == 0) { val cp = next.localCheckpoint(); next.unpersist(); cp }
          else next
        i += 1
      }
    }
    vocab.unpersist()
    BpeModel(merges.result())
  }

  /** Encode one whitespace-tokenized text: per word, greedily merge the
    * LOWEST-RANK adjacent pair until none applies (GPT-2 `bpe()` loop).
    * Returns pieces across all words, in order. */
  def encodeText(text: String, ranks: Map[(String, String), Int]): Array[String] = {
    val words = text.trim.split("\\s+")
    val out = Array.newBuilder[String]
    words.foreach { w =>
      if (w.nonEmpty) {
        var syms: Vector[String] = symbolsOf(w)
        var done = false
        while (!done && syms.length > 1) {
          var bestRank = Int.MaxValue
          var bestIdx = -1
          var j = 0
          while (j < syms.length - 1) {
            val r = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
            if (r < bestRank) { bestRank = r; bestIdx = j }
            j += 1
          }
          if (bestIdx < 0) done = true
          else syms = (syms.take(bestIdx) :+ (syms(bestIdx) + syms(bestIdx + 1))) ++
            syms.drop(bestIdx + 2)
        }
        syms.foreach(out += _)
      }
    }
    out.result()
  }

  /** Corpus-wide encode: adds `pieces` (array<string>) via the codegen
    * expression. One map pass; the model rides into codegen as a
    * reference object. */
  def encode(textCol: Column, model: BpeModel): Column =
    graft.expr.functions.bpe_encode(textCol, model)

  /** Persist a trained model — the tokenizer is an offline artifact like
    * the IVF quantizer ([[Vectors.ivfSave]]): fit once per corpus, load
    * per job. Plain merges.txt format (one `left right` pair per line,
    * rank = line order — the GPT-2 vocabulary file convention). Symbols
    * never contain whitespace (they come from whitespace tokenization),
    * so the space separator is unambiguous. */
  def save(model: BpeModel, path: java.nio.file.Path): Unit = {
    // real merges.txt files lead with a version header (HF tooling drops
    // the first line as a header unconditionally — without one, a file
    // we write would lose its highest-priority merge over there)
    val lines = "#version: 0.2" :: model.merges.map { case (a, b) => s"$a $b" }
    java.nio.file.Files.write(path,
      String.join("\n", lines: _*).getBytes("UTF-8"))
  }

  def load(path: java.nio.file.Path): BpeModel = {
    val lines = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
      .split("\n", -1).toList
      .map(_.stripSuffix("\r")) // CRLF checkouts must not poison symbols
      .filter(l => l.nonEmpty && !l.startsWith("#version"))
    BpeModel(lines.map { l =>
      val sp = l.indexOf(' ')
      require(sp > 0, s"malformed merges line: '$l'")
      (l.substring(0, sp), l.substring(sp + 1))
    })
  }
}
