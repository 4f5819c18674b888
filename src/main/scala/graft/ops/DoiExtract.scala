package graft.ops

import java.util.regex.Pattern

/** F9 — DOI extraction with bibliography-context veto
  * (SURVEY.md §2.8 F9). Mirrors pdf_extraction/pdf_marker_extraction.py:134-163:
  *
  *  - search only the first `maxChars` characters (title-page area)
  *  - pattern `10\.\d{4,}/[^\s\])>",;]+`, case-insensitive, in order
  *  - strip trailing `.,;:\])>` runs from each candidate
  *  - candidate valid if length >= 10 and contains '/'
  *  - veto when "reference"/"cited"/"bibliography" occurs in the 200-char
  *    window starting 100 chars before the candidate's FIRST occurrence
  *    (the reference uses `str.find`, so a repeated DOI always takes the
  *    first occurrence's context — preserved)
  *  - first surviving candidate wins; None otherwise
  */
object DoiExtract {

  // CPython classes (r13): \d is unicode Nd and \s the unicode
  // whitespace set — under Java's ASCII \s an NBSP after a DOI would be
  // ABSORBED into the suffix (Python stops there), yielding a wrong DOI
  // on scraped text where NBSP is routine. Same classes in the DuckDB
  // oracle replay.
  private val doiPattern =
    Pattern.compile("10\\.\\p{Nd}{4,}/[^" + CleanCorpus.PyWsBody + "\\]\\)>\",;]+",
      Pattern.CASE_INSENSITIVE)
  private val trailingPunct = Pattern.compile("[.,;:\\]\\)>]+$")
  private val vetoWords = Array("reference", "cited", "bibliography")

  def extractDoi(text: String, maxChars: Int = 5000): Option[String] = {
    if (text == null || text.isEmpty) return None
    val searchText = if (text.length > maxChars) text.substring(0, maxChars) else text
    val m = doiPattern.matcher(searchText)
    while (m.find()) {
      val candidate = m.group()
      val cleaned = trailingPunct.matcher(candidate).replaceAll("")
      if (cleaned.length >= 10 && cleaned.contains('/')) {
        val firstIdx = searchText.indexOf(candidate)
        val ctxStart = math.max(0, firstIdx - 100)
        val ctxEnd = math.min(searchText.length, ctxStart + 200)
        // Locale.ROOT: mirrors CPython str.lower() (locale-independent
        // Unicode casing) — a tr_TR default locale would map I to dotless
        // ı and silently miss the "bibliography" veto keyword
        val context = searchText.substring(ctxStart, ctxEnd)
          .toLowerCase(java.util.Locale.ROOT)
        if (!vetoWords.exists(context.contains)) return Some(cleaned)
      }
    }
    None
  }
}
