package graft.ops

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

/** F1 `clean_corpus` — the reference's flagship text-cleaning operator,
  * re-implemented as a pure JVM function (SURVEY.md §2.8 F1, §7.4 #1).
  *
  * Semantics mirror fda_rag_extraction/scripts/json_split_and_clean.py:16-243
  * exactly, including its quirks:
  *
  *  - a line matching a cutoff pattern truncates the document (the line and
  *    everything after it is dropped) … (json_split_and_clean.py:195-197)
  *  - … UNLESS dosage info appears within the next 15 lines, or within 15
  *    lines after a later line ending in ':', or the previous kept line ends
  *    in ':' (json_split_and_clean.py:149-190). A rescued cutoff line then
  *    falls through the remaining filters and — contrary to the reference's
  *    own comment — is KEPT (its `continue` targets the pattern loop, not
  *    the line loop; json_split_and_clean.py:186-190). Preserved as-is.
  *  - blank lines are dropped except immediately after a kept line ending
  *    in ':' (json_split_and_clean.py:113-118)
  *  - boilerplate patterns are start-anchored matches; repeated headers are
  *    exact (case-sensitive) standalone lines (json_split_and_clean.py:203-215)
  *  - post-pass: unicode dash/quote normalization, space-run collapse,
  *    3+-newline collapse, final trim (json_split_and_clean.py:222-241)
  *
  * The per-line scan is stateful with lookahead, so it is deliberately a
  * scalar JVM function (wrapped as a codegen-friendly Catalyst expression in
  * [[graft.expr.CleanCorpusExpr]]) rather than a column composition — the
  * stateless layers alone are available in [[TextOps]] for oracle-checkable
  * queries.
  */
object CleanCorpus {

  private val MaxLookahead = 5
  private val ExtendedLookahead = MaxLookahead * 3 // 15 lines

  /** CPython `\s` for str patterns, as an explicit class: Unicode
    * White_Space (09-0D, 20, 85, A0, 1680, 2000-200A, 2028, 2029, 202F,
    * 205F, 3000) PLUS 1C-1F (bidi separators — Python's re includes
    * them, Java's \p{IsWhite_Space} does not). Java's default `\s` is
    * ASCII-only, so `"120 mg"` (NBSP) would NOT be dosage to a
    * `\s`-based port while the reference rescues a cutoff on it
    * (verified against json_split_and_clean.py — the same
    * ASCII-vs-unicode class gap as the r12 autojunk finding).
    * Identical class in the DuckDB oracle (SparkEntry.f1TraceSql). */
  private[graft] val PyWsCodepoints: Seq[Int] =
    Seq(0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x1C, 0x1D, 0x1E, 0x1F,
      0x20, 0x85, 0xA0, 0x1680) ++ (0x2000 to 0x200A) ++
      Seq(0x2028, 0x2029, 0x202F, 0x205F, 0x3000)

  /** The class BODY (no brackets) — for composing negated/merged
    * classes like `[^\p{L}\p{N}_<ws>]`. Same syntax in Java regex and
    * RE2, so the DuckDB oracles embed these strings verbatim. */
  private[graft] val PyWsBody: String =
    PyWsCodepoints.map(c => f"\\x{$c%04X}").mkString

  private[graft] val PyWs: String = "[" + PyWsBody + "]"

  /** CPython `\w` for str patterns ≈ unicode letters + numerics + '_'
    * (CPython's ISALNUM: categories L* ∪ N* plus underscore) — Java's
    * default `\w` is ASCII [a-zA-Z0-9_], which destroys 'β', 'naïve',
    * every accented or non-Latin word char the reference keeps. */
  private[graft] val PyWordBody = "\\p{L}\\p{N}_"

  /** CPython `\d` for str patterns = Unicode decimal digits (category
    * Nd) — Java's default `\d` is ASCII [0-9]. */
  private[graft] val PyD = "\\p{Nd}"

  // json_split_and_clean.py:37-59
  private val cutoffPatterns: Array[Pattern] = Array(
    ".*This review.*used.*Assessment Aid.*",
    ".*This review was conducted.*Assessment Aid.*",
    ".*This review used.*Real-Time Oncology Review.*",
    ".*This review used.*RTOR.*",
    ".*This review was conducted under Project Orbis.*",
    ".*The application was granted.*priority review.*",
    ".*The application was granted.*breakthrough.*",
    ".*The application was granted.*orphan.*",
    ".*granted.*priority review.*",
    ".*granted.*breakthrough designation.*",
    ".*granted.*orphan drug designation.*",
    ".*received.*orphan drug designation.*",
    ".*received.*breakthrough designation.*",
    ".*received.*priority review.*"
  ).map(ci)

  // json_split_and_clean.py:64-93 (start-anchored: Python re.match)
  private val removePatterns: Array[Pattern] = Array(
    "^Follow the Oncology Center of Excellence.*",
    "^Follow the Oncology Center of Excellence on X.*",
    "^Follow the Oncology Center of Excellence on X \\(formerly Twitter\\).*",
    "^Follow the Oncology Center of Excellence on Twitter.*",
    "^Follow us on X.*",
    "^Healthcare professionals should report all serious adverse events.*",
    s"^Full prescribing information for$PyWs+.*",
    s"^View full prescribing information for$PyWs+.*",
    s"^See full prescribing information for$PyWs+.*",
    "^For assistance with single-patient INDs for investigational oncology products.*",
    "^FDA expedited programs are described in the Guidance for Industry.*",
    "^A description of FDA expedited programs is in the Guidance.*",
    "^FDA expedited programs are described in the Guidance.*",
    "^For information on the COVID-19 pandemic.*",
    "^FDA: Coronavirus Disease 2019 \\(COVID-19\\).*",
    "^CDC: Coronavirus \\(COVID-19\\).*"
  ).map(ci)

  // json_split_and_clean.py:96-100 (exact standalone lines, case-sensitive)
  private val headersToRemove: Set[String] =
    Set("Efficacy and Safety", "Recommended Dosage", "Expedited Programs")

  // json_split_and_clean.py:123-131 (re.search with IGNORECASE on str:
  // \d and \s are UNICODE classes — see PyWs/PyD)
  private val dosagePatterns: Array[Pattern] = Array(
    s".*$PyD+$PyWs*(kg|mg|g|mcg).*",
    s".*less than.*$PyD+.*",
    s".*greater than.*$PyD+.*",
    s".*$PyD+$PyWs*(or|and)$PyWs*(greater|less).*",
    ".*orally.*twice.*daily.*",
    ".*orally.*once.*daily.*",
    ".*mg.*orally.*"
  ).map(ci)

  /** CASE_INSENSITIVE+UNICODE_CASE = CPython re.IGNORECASE on str (both
    * simple-casefold: ſ→s, K→k). UNIX_LINES makes Java's '.' exclude only
    * \n — CPython re and RE2 semantics — where default Java '.' also
    * excludes \r, U+0085, U+2028, U+2029. Lines here never contain \n but
    * CAN contain an interior \r (a bare-\r-endings document collapses to
    * one line), so without UNIX_LINES a '.*'-spanning pattern like
    * "granted.*priority review" would match in the reference and the
    * oracle but not here. ^ is unaffected (no MULTILINE). */
  private def ci(p: String): Pattern =
    Pattern.compile(p,
      Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE | Pattern.UNIX_LINES)

  /** Python `str.strip()` parity: Java's isWhitespace misses NBSP-family
    * code points that Python's `str.isspace` includes. */
  private def isPySpace(c: Char): Boolean =
    Character.isWhitespace(c) || c == '\u00A0' || c == '\u2007' ||
      c == '\u202F' || c == '\u0085'

  private[graft] def pyStrip(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && isPySpace(s.charAt(i))) i += 1
    while (j > i && isPySpace(s.charAt(j - 1))) j -= 1
    s.substring(i, j)
  }

  private def isDosage(s: String): Boolean = {
    var k = 0
    while (k < dosagePatterns.length) {
      if (dosagePatterns(k).matcher(s).find()) return true
      k += 1
    }
    false
  }

  /** Dosage info in `lines(from until untilExcl)` (stripped, non-empty)? */
  private def dosageAhead(lines: Array[String], from: Int, untilExcl: Int): Boolean = {
    var k = from
    val end = math.min(untilExcl, lines.length)
    while (k < end) {
      val l = pyStrip(lines(k))
      if (l.nonEmpty && isDosage(l)) return true
      k += 1
    }
    false
  }

  /** Per-line decision codes — THE ORACLE TRACE for `f1_clean_corpus`.
    *
    * `clean()` is assembled FROM this kernel (decide → assemble), and the
    * trace writer in SparkEntry.writeOracleAux exports exactly this
    * array, so the declared query and the exported trace cannot drift:
    * there is one decision path.
    *
    *  - 'K' kept (appended stripped)
    *  - 'R' rescued cutoff line, kept (the reference quirk: its
    *        `continue` targets the pattern loop, so the line falls
    *        through the remaining filters and is appended)
    *  - 'B' blank appended (previous appended line ended with ':')
    *  - 'E' blank dropped
    *  - 'P' boilerplate drop (start-anchored remove pattern)
    *  - 'H' repeated-header drop (exact standalone line)
    *  - 'C' cutoff — this line truncates the document
    *  - 'T' tail — after the cutoff, never examined
    *
    * Every decision is re-verifiable from the raw lines + the PRIOR
    * decisions: the cutoff/boilerplate/dosage regex layers are stateless
    * per line, the 15-line (+nested ':'-window) dosage lookahead is a
    * pure EXISTS over raw line ranges, and the "previous kept line ends
    * with ':'" state is a fold over the earlier appended decisions — the
    * DuckDB oracle replays all three and rebuilds the content
    * (json_split_and_clean.py:104-217 semantics, quirks preserved).
    */
  def decisions(lines: Array[String]): Array[Char] = {
    val out = new Array[Char](lines.length)
    var lastAppended: String = null // value of the last appended line
    var idx = 0
    var truncated = false
    while (idx < lines.length) {
      if (truncated) out(idx) = 'T'
      else {
        val stripped = pyStrip(lines(idx))
        if (stripped.isEmpty) {
          // blank kept only right after a ':'-terminated kept line (:113-118)
          if (lastAppended != null && lastAppended.endsWith(":")) {
            out(idx) = 'B'; lastAppended = ""
          } else out(idx) = 'E'
        } else {
          var isCutoff = false
          var rescued = false
          var p = 0
          while (p < cutoffPatterns.length && !isCutoff && !rescued) {
            if (cutoffPatterns(p).matcher(stripped).find()) {
              val prevSuggestsList =
                lastAppended != null && lastAppended.endsWith(":")
              var followup = false
              // direct 15-line lookahead for dosage info (:152-168)
              var la = idx + 1
              val laEnd = math.min(idx + ExtendedLookahead + 1, lines.length)
              while (la < laEnd && !followup) {
                val look = pyStrip(lines(la))
                if (look.nonEmpty) {
                  if (isDosage(look)) followup = true
                  // a later ':' line opens a further 15-line window (:170-183)
                  else if (look.endsWith(":") &&
                    dosageAhead(lines, la + 1, la + ExtendedLookahead + 1))
                    followup = true
                }
                la += 1
              }
              // the rescue condition is pattern-independent, so the
              // reference's per-pattern re-check (p += 1, match again,
              // rescue again) collapses to: rescued once ⇒ rescued for
              // all remaining patterns — the line falls through
              if (followup || prevSuggestsList) rescued = true
              else isCutoff = true
            } else p += 1
          }
          if (isCutoff) { out(idx) = 'C'; truncated = true }
          else {
            val boilerplate =
              removePatterns.exists(_.matcher(stripped).lookingAt())
            if (boilerplate) out(idx) = 'P'
            else if (headersToRemove.contains(stripped)) out(idx) = 'H'
            else {
              out(idx) = if (rescued) 'R' else 'K'
              lastAppended = stripped
            }
          }
        }
      }
      idx += 1
    }
    out
  }

  def clean(text: String): String = {
    if (text == null || text.isEmpty) return ""
    val lines = text.split("\n", -1)
    val d = decisions(lines)
    val kept = new ArrayBuffer[String](lines.length)
    var i = 0
    while (i < lines.length) {
      d(i) match {
        case 'K' | 'R' => kept += pyStrip(lines(i))
        case 'B'       => kept += ""
        case _         => ()
      }
      i += 1
    }

    // post-pass (:222-241)
    var out = kept.mkString("\n")
    out = out
      .replace('–', '-').replace('—', '-').replace('−', '-')
      .replace('‘', '\'').replace('’', '\'')
      .replace('“', '"').replace('”', '"')
    out = out.replaceAll(" +", " ")
    out = out.replaceAll("\n{3,}", "\n\n")
    pyStrip(out)
  }
}
