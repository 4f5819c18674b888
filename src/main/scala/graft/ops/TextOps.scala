package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar text/cleaning column functions (SURVEY.md §2.8 F-family).
  *
  * Each op is a pure `Column => Column` built from codegen'd Spark
  * `functions._` — no UDFs — so Catalyst can push/fold/pipeline them.
  * Reference semantics cited per-op (file:line under /root/reference/).
  */
object TextOps {

  /** CPython regex-class parity (see CleanCorpus.PyWs/PyWordBody): the
    * reference evaluates \s/\w/\d with unicode semantics; Java's
    * defaults are ASCII. All pubmed_enrichment ports below use these. */
  private val WS = CleanCorpus.PyWs
  private val WSB = CleanCorpus.PyWsBody
  private val WORDB = CleanCorpus.PyWordBody

  /** Python `str.strip()` as a Column — strips the full unicode
    * whitespace set, where Spark's 1-arg `trim` strips ASCII spaces
    * only. Charset trim, not regex: cheaper and exactly the set. */
  private val pyWsChars: String =
    CleanCorpus.PyWsCodepoints.map(_.toChar).mkString
  private[graft] def pyStrip(c: Column): Column = trim(c, pyWsChars)

  /** F2 — remove markdown image tags `![alt](url)`.
    * Ref: fda_rag_extraction/scripts/combine_json_to_jsonl.py:116. */
  def stripMarkdownImages(c: Column): Column =
    regexp_replace(c, "!\\[.*?\\]\\(.*?\\)", "")

  /** F3 — strip `markdown='…'` extraction-artifact wrapper.
    * Ref: fda_rag_extraction/scripts/combine_json_to_jsonl.py:110-113. */
  def stripMarkerWrapper(c: Column): Column =
    when(c.startsWith("markdown='") && c.endsWith("'"),
      c.substr(lit(11), length(c) - 11)).otherwise(c)

  /** F4 — turn literal `\n` escapes into real newlines, then trim.
    * Ref: fda_rag_extraction/scripts/combine_json_to_jsonl.py:119. */
  def unescapeNewlines(c: Column): Column =
    trim(regexp_replace(c, "\\\\n", "\n"))

  /** P5 helper — the PDF publish content clean: strip markdown images,
    * unescape literal `\n`, collapse 3+ newlines to 2, then full
    * whitespace strip (Python `.strip()` removes all whitespace, so the
    * trim here takes an explicit trim-set, not the spaces-only default).
    * Ref: pdf_extraction/combine_json_to_jsonl.py:46-61. */
  def pdfCleanContent(c: Column): Column =
    pyStrip(regexp_replace(
      regexp_replace(stripMarkdownImages(c), "\\\\n", "\n"), "\n{3,}", "\n\n"))

  /** F5 — collapse runs of spaces to one, 3+ newlines to 2.
    * Ref: fda_rag_extraction/scripts/json_split_and_clean.py:236-238. */
  def collapseWhitespace(c: Column): Column =
    regexp_replace(regexp_replace(c, " +", " "), "\n{3,}", "\n\n")

  /** F6 — normalize unicode dashes/quotes to ASCII.
    * Ref: fda_rag_extraction/scripts/json_split_and_clean.py:222-232. */
  def normalizeUnicodePunct(c: Column): Column =
    translate(c, "–—−‘’“”", "---''\"\"")

  /** F7 — comparison normal form: lower+strip, then punct→space, then
    * whitespace-run collapse. NOTE: the reference strips BEFORE the
    * punctuation substitution, so a trailing punctuation mark leaves a
    * trailing space — preserved for verify-decision parity. CPython
    * classes throughout (r13): `[^\w\s]` keeps β/naïve/CJK word chars
    * and unicode digits; `\s+` collapses NBSP-family runs; the strip is
    * Python's unicode strip, not ASCII-space trim.
    * Ref: pdf_extraction/pubmed_enrichment.py:254-260. */
  def normalizeForCompare(c: Column): Column =
    regexp_replace(regexp_replace(pyStrip(lower(c)),
      "[^" + WORDB + WSB + "]", " "), WS + "+", " ")

  /** F8 — canonical DOI: strip (unicode) + lower, then drop doi.org /
    * doi: prefixes (`\s*` is CPython's unicode class).
    * Ref: pdf_extraction/pubmed_enrichment.py:262-268. */
  def normalizeDoi(c: Column): Column =
    regexp_replace(lower(pyStrip(c)), "^(https?://doi\\.org/|doi:" + WS + "*)", "")

  /** F10 — publication year from citation `(YYYY)`; caller supplies the
    * default (reference uses current year — non-deterministic, so tests
    * pin it). CPython \d = \p{Nd}.
    * Ref: pdf_extraction/combine_json_to_jsonl.py:40-43. */
  def extractYear(citation: Column, default: Column): Column =
    coalesce(nullif(regexp_extract(citation, "\\((\\p{Nd}{4})\\)", 1), lit("")), default)

  /** F11 — title cleaned for search: unicode-strip FIRST, then
    * `[;:,]` → space — the reference does `re.sub(..., title.strip())`
    * with NO outer strip, so a leading/trailing `,;:` leaves a space
    * (r13 fix: the old port trimmed after the substitution and dropped
    * that space). Ref: pdf_extraction/pubmed_enrichment.py:149. */
  def cleanTitleForSearch(c: Column): Column =
    regexp_replace(pyStrip(c), "[;:,]", " ")

  /** F18 — whole-record fallback serialization.
    * Ref: fda_rag_extraction/scripts/combine_json_to_jsonl.py:98. */
  def recordToJsonString(cols: Column*): Column = to_json(struct(cols: _*))

  /** P3 — resolve an href against a base url: absolute hrefs pass
    * through, others get the base prefixed (the reference's urljoin use is
    * root-relative hrefs only, fda_watcher.py:321-323). */
  def urlResolve(base: Column, href: Column): Column = {
    val h = pyStrip(href) // reference: raw_link.strip(), unicode set
    when(h.startsWith("http"), h)
      .when(h.startsWith("/"), concat(regexp_replace(trim(base), "/+$", ""), h))
      .otherwise(concat(regexp_replace(trim(base), "/+$", ""), lit("/"), h))
  }

  /** F14 — formatted "now"; the instant is an explicit column so callers
    * pin it for determinism (current_timestamp() in production,
    * fda_watcher.py:338 / SURVEY §7.4 #5). */
  def formatNow(instant: Column, pattern: String): Column =
    date_format(instant, pattern)

  /** P6 — non-empty default: value if non-blank else fallback.
    * Ref: fda_rag_extraction/scripts/combine_json_to_jsonl.py:96-104. */
  def defaultNonEmpty(c: Column, fallback: Column): Column =
    coalesce(nullif(trim(c), lit("")), fallback)
}
