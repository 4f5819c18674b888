package graft.ops

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

/** F13 — HTML → ordered text extraction, mirroring the reference's
  * BeautifulSoup cascade (fda_rag_extraction/scripts/fda_watcher.py:158-227):
  *
  *  1. `div[role=main]` → 2. `div.field--name-body` → 3. `article` →
  *  4. `div.node__content` → 5. the div containing the most `<p>` tags →
  *  6. `body`; then walk `h1..h6 | p | ul | ol` in document order,
  *  space-joined trimmed text per element (`get_text(" ", strip=True)`),
  *  only direct `<li>` children for lists, parts joined by `"\n\n"`,
  *  and the >50-chars substance gate (fda_watcher.py:224-227).
  *
  * Dependency-free (regex + depth counting) rather than a DOM library;
  * assumes well-formed markup (explicit closing tags) — the engine's
  * ingestion surface, not a general browser. The URL-level short-circuits
  * live in [[corpusForUrl]] (fda_watcher.py:130-134).
  */
object HtmlExtract {

  private val tagPat =
    Pattern.compile("<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*)>")

  private case class Tag(name: String, closing: Boolean, attrs: String,
      start: Int, end: Int)

  private def tags(html: String): Vector[Tag] = {
    val m = tagPat.matcher(html)
    val out = Vector.newBuilder[Tag]
    while (m.find()) {
      // Locale.ROOT: an <I> tag must lowercase to "i" on every JVM —
      // the tr_TR default locale maps it to dotless ı
      out += Tag(m.group(2).toLowerCase(java.util.Locale.ROOT),
        m.group(1) == "/", m.group(3),
        m.start(), m.end())
    }
    out.result()
  }

  /** Inner-content span of the element whose opening tag is `all(i)`. */
  private def regionOf(all: Vector[Tag], i: Int): (Int, Int) = {
    val open = all(i)
    var depth = 1
    var j = i + 1
    while (j < all.length) {
      val t = all(j)
      if (t.name == open.name) {
        depth += (if (t.closing) -1 else 1)
        if (depth == 0) return (open.end, t.start)
      }
      j += 1
    }
    (open.end, Int.MaxValue) // unclosed: to end of document
  }

  private def attr(attrs: String, name: String): Option[String] = {
    val p = Pattern.compile(name + "\\s*=\\s*([\"'])(.*?)\\1",
      Pattern.CASE_INSENSITIVE)
    val m = p.matcher(attrs)
    if (m.find()) Some(m.group(2)) else None
  }

  private val entities = Seq("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ")

  /** `get_text(" ", strip=True)` equivalent over an inner-HTML span. */
  private def textOf(html: String): String = {
    var s = html.replaceAll("(?is)<(script|style)[^>]*>.*?</\\1>", " ")
    s = s.replaceAll("<[^>]*>", " ")
    entities.foreach { case (e, r) => s = s.replace(e, r) }
    s = s.replaceAll("&#(\\d+);", " ")
    s.replaceAll("\\s+", " ").trim
  }

  /** The content region per the 6-step cascade; None when no body/divs. */
  private def contentRegion(html: String, all: Vector[Tag]): Option[(Int, Int)] = {
    def openIdx(pred: Tag => Boolean): Option[Int] =
      all.indices.find(i => !all(i).closing && pred(all(i)))
    val divWith: (String => Boolean) => Option[Int] = predAttr =>
      openIdx(t => t.name == "div" && predAttr(t.attrs))

    divWith(a => attr(a, "role").contains("main"))
      .orElse(divWith(a => attr(a, "class").exists(_.contains("field--name-body"))))
      .orElse(openIdx(_.name == "article"))
      .orElse(divWith(a => attr(a, "class").exists(_.contains("node__content"))))
      .orElse {
        // div with the most <p> descendants (first wins ties, like max())
        val divIdxs = all.indices.filter(i => !all(i).closing && all(i).name == "div")
        if (divIdxs.isEmpty) None
        else Some(divIdxs.maxBy { i =>
          val (s, e) = regionOf(all, i)
          val end = math.min(e, html.length)
          all.count(t => !t.closing && t.name == "p" && t.start >= s && t.end <= end)
        })
      }
      .orElse(openIdx(_.name == "body"))
      .map(i => regionOf(all, i))
  }

  private val blocks = Set("h1", "h2", "h3", "h4", "h5", "h6", "p", "ul", "ol")

  def extractText(html: String): String = {
    if (html == null || html.isEmpty) return ""
    val all = tags(html)
    val region = contentRegion(html, all) match {
      case Some((s, e)) => (s, math.min(e, html.length))
      case None => return ""
    }
    val parts = new ArrayBuffer[String]()
    var i = 0
    while (i < all.length) {
      val t = all(i)
      if (!t.closing && blocks.contains(t.name) &&
          t.start >= region._1 && t.end <= region._2) {
        val (cs, ce0) = regionOf(all, i)
        val ce = math.min(ce0, html.length)
        if (t.name == "ul" || t.name == "ol") {
          // direct-child <li> only (recursive=False, fda_watcher.py:215)
          var depth = 0
          var j = i + 1
          while (j < all.length && all(j).start < ce) {
            val u = all(j)
            if (!u.closing && (u.name == "ul" || u.name == "ol")) depth += 1
            else if (u.closing && (u.name == "ul" || u.name == "ol")) depth -= 1
            else if (!u.closing && u.name == "li" && depth == 0) {
              val (ls, le0) = regionOf(all, j)
              val le = math.min(le0, html.length)
              val li = textOf(html.substring(ls, le))
              if (li.nonEmpty) parts += li
            }
            j += 1
          }
        } else {
          val txt = textOf(html.substring(cs, ce))
          if (txt.nonEmpty) parts += txt
        }
      }
      i += 1
    }
    val full = parts.mkString("\n\n")
    if (full.length > 50) full else ""
  }

  /** URL-level short-circuits of the scrape step (fda_watcher.py:130-134). */
  def corpusForUrl(url: String, html: => String): String = {
    if (url == null || !url.contains("http")) ""
    else if (url.toLowerCase(java.util.Locale.ROOT).endsWith(".pdf"))
      "[PDF CONTENT - REQUIRES OCR]"
    else extractText(html)
  }
}
