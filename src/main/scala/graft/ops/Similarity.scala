package graft.ops

import scala.collection.mutable

/** F12 — Ratcliff/Obershelp similarity with CPython `difflib` parity
  * (SURVEY.md §2.8 F12, §7.4 #2).
  *
  * The reference's verify decision hinges on
  * `SequenceMatcher(None, a, b).ratio() >= 0.90`
  * (pdf_extraction/pubmed_enrichment.py:291-293), so this must reproduce
  * difflib exactly: the b2j index, the *autojunk* rule (elements occurring
  * in more than 1% of `b` are excluded from matching when |b| >= 200), the
  * longest-matching-block search with its junk-aware extension steps, and
  * the recursive block accumulation.
  *
  * Pure JVM function; exposed to Spark through
  * [[graft.expr.RatcliffSimilarity]] (codegen'd static call).
  */
object Similarity {

  /** `difflib.SequenceMatcher(None, a, b).ratio()`. */
  def ratio(a: String, b: String): Double = {
    if (a == null || b == null) return 0.0
    val la = a.length
    val lb = b.length
    if (la + lb == 0) return 1.0
    var matches = 0

    // b2j index + autojunk popular-element set (difflib __chain_b)
    val b2j = new mutable.HashMap[Char, mutable.ArrayBuffer[Int]]()
    var j = 0
    while (j < lb) {
      b2j.getOrElseUpdate(b.charAt(j), new mutable.ArrayBuffer[Int]()) += j
      j += 1
    }
    val popular = new mutable.HashSet[Char]()
    if (lb >= 200) {
      val ntest = lb / 100 + 1
      for ((ch, idxs) <- b2j if idxs.length > ntest) popular += ch
      popular.foreach(b2j.remove)
    }
    @inline def isJunk(ch: Char): Boolean = popular.contains(ch)

    // difflib find_longest_match over [alo,ahi) x [blo,bhi)
    def longestMatch(alo: Int, ahi: Int, blo: Int, bhi: Int): (Int, Int, Int) = {
      var besti = alo
      var bestj = blo
      var bestsize = 0
      var j2len = new mutable.HashMap[Int, Int]()
      var i = alo
      while (i < ahi) {
        val newj2len = new mutable.HashMap[Int, Int]()
        b2j.get(a.charAt(i)) match {
          case Some(idxs) =>
            var p = 0
            var break = false
            while (p < idxs.length && !break) {
              val jj = idxs(p)
              if (jj >= bhi) break = true
              else if (jj >= blo) {
                val k = j2len.getOrElse(jj - 1, 0) + 1
                newj2len(jj) = k
                if (k > bestsize) { besti = i - k + 1; bestj = jj - k + 1; bestsize = k }
              }
              p += 1
            }
          case None =>
        }
        j2len = newj2len
        i += 1
      }
      // extend with non-junk on both sides, then junk on both sides
      while (besti > alo && bestj > blo && !isJunk(b.charAt(bestj - 1)) &&
        a.charAt(besti - 1) == b.charAt(bestj - 1)) {
        besti -= 1; bestj -= 1; bestsize += 1
      }
      while (besti + bestsize < ahi && bestj + bestsize < bhi &&
        !isJunk(b.charAt(bestj + bestsize)) &&
        a.charAt(besti + bestsize) == b.charAt(bestj + bestsize)) {
        bestsize += 1
      }
      while (besti > alo && bestj > blo && isJunk(b.charAt(bestj - 1)) &&
        a.charAt(besti - 1) == b.charAt(bestj - 1)) {
        besti -= 1; bestj -= 1; bestsize += 1
      }
      while (besti + bestsize < ahi && bestj + bestsize < bhi &&
        isJunk(b.charAt(bestj + bestsize)) &&
        a.charAt(besti + bestsize) == b.charAt(bestj + bestsize)) {
        bestsize += 1
      }
      (besti, bestj, bestsize)
    }

    // iterative get_matching_blocks, summing sizes only
    val queue = mutable.Stack[(Int, Int, Int, Int)]((0, la, 0, lb))
    while (queue.nonEmpty) {
      val (alo, ahi, blo, bhi) = queue.pop()
      val (i, jm, k) = longestMatch(alo, ahi, blo, bhi)
      if (k > 0) {
        matches += k
        if (alo < i && blo < jm) queue.push((alo, i, blo, jm))
        if (i + k < ahi && jm + k < bhi) queue.push((i + k, ahi, jm + k, bhi))
      }
    }
    2.0 * matches / (la + lb)
  }
}
