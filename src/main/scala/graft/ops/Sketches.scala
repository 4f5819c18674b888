package graft.ops

import java.nio.charset.StandardCharsets

/** Pure JVM sketch primitives for the scale extensions (builder-prompt
  * north star: dedup + fingerprinting for a 100 TB training-data pipeline).
  * Deterministic — fixed seeds, no wall-clock — so results are reproducible
  * across runs and cluster sizes. Exposed to Spark via
  * [[graft.expr.SketchExprs]] (codegen'd static calls).
  */
object Sketches {

  /** FNV-1a 64-bit over UTF-8 bytes — dependency-free deterministic hash. */
  /** FNV-1a over raw payload bytes, masked to 7 bits per byte — the
    * byte-array twin of [[fnv1a64]] ∘ the `(b & 0x7f).toChar` string
    * masking MediaOps used to do per row: identical values, zero String
    * allocation on the binary hot path. */
  def fnv1a64Masked(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0x7fL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Mersenne prime 2^31-1: permutation universe for MinHash. */
  val MinHashP: Long = 2147483647L

  /** Deterministic permutation coefficients (a_j, b_j), seed fixed. */
  def minHashCoeffs(numHashes: Int, seed: Long = 42L): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numHashes) {
      val a = 1L + (math.abs(rnd.nextLong()) % (MinHashP - 1))
      val b = math.abs(rnd.nextLong()) % MinHashP
      (a, b)
    }
  }

  /** Whitespace tokens of a trimmed string; empty array for blank input. */
  def tokenize(text: String): Array[String] = {
    val t = if (text == null) "" else text.trim
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

  /** Distinct k-token shingles joined by single spaces. */
  def tokenShingles(text: String, k: Int): Array[String] = {
    val w = tokenize(text)
    if (w.length < k) Array.empty
    else {
      val out = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i + k <= w.length) {
        val sb = new StringBuilder(w(i))
        var j = 1
        while (j < k) { sb.append(' ').append(w(i + j)); j += 1 }
        out.add(sb.toString)
        i += 1
      }
      out.toArray(new Array[String](out.size))
    }
  }

  /** Sorted distinct FNV-1a hashes of the k-token shingles — the compact
    * set image used for O(n+m) merge-based Jaccard in [[Dedup]]. */
  def hashedShingleSet(text: String, k: Int): Array[Long] = {
    val sh = tokenShingles(text, k)
    val out = new Array[Long](sh.length)
    var i = 0
    while (i < sh.length) { out(i) = fnv1a64(sh(i)); i += 1 }
    java.util.Arrays.sort(out)
    out
  }

  /** MinHash signature over distinct k-token shingles: sig_j =
    * min over shingles of (a_j * (fnv(s) mod p) + b_j) mod p.
    * One pass over shingles × numHashes; empty text → all-p sentinel
    * (never collides with a real signature value, which is < p). */
  def minHashSignature(text: String, shingleK: Int, coeffs: Array[(Long, Long)]): Array[Long] = {
    val shingles = tokenShingles(text, shingleK)
    val n = coeffs.length
    val sig = Array.fill(n)(MinHashP)
    var si = 0
    while (si < shingles.length) {
      val h = java.lang.Math.floorMod(fnv1a64(shingles(si)), MinHashP)
      var j = 0
      while (j < n) {
        val (a, b) = coeffs(j)
        val v = (a * h + b) % MinHashP
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      si += 1
    }
    sig
  }

  /** MinHash signature straight from an already-hashed shingle set (the
    * `hs` arrays of the Jaccard sketch tables, elements = fnv1a64 of the
    * shingle): identical output to [[minHashSignature]] on the
    * originating text — same floorMod-to-universe reduction, same
    * permutations — without re-shingling. Empty set → all-p sentinel. */
  def minHashFromHashes(hashes: Array[Long], coeffs: Array[(Long, Long)]): Array[Long] = {
    val n = coeffs.length
    val sig = Array.fill(n)(MinHashP)
    var si = 0
    while (si < hashes.length) {
      val h = java.lang.Math.floorMod(hashes(si), MinHashP)
      var j = 0
      while (j < n) {
        val (a, b) = coeffs(j)
        val v = (a * h + b) % MinHashP
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      si += 1
    }
    sig
  }

  /** 64-bit SimHash over whitespace tokens (multiset semantics: repeated
    * tokens weigh repeatedly). Empty text → 0. */
  def simHash64(text: String): Long = {
    val toks = tokenize(text)
    if (toks.isEmpty) return 0L
    val acc = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = fnv1a64(toks(i))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) acc(j) += 1 else acc(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (acc(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Per-position rolling k-gram FNV hashes, shared by the winnowing
    * kernels. ASCII fast path hashes windows of ONE byte buffer with
    * zero per-window allocation (the substring-per-position spelling
    * allocated a String + byte[] per gram — measured 5.2 s -> see bench
    * on the sf0.1 overlap join); any non-ASCII char falls back to the
    * substring path, whose UTF-8 bytes define the hash for all text. */
  private def gramHashArray(t: String, k: Int): Array[Long] = {
    val n = t.length - k + 1
    val out = new Array[Long](n)
    var ascii = true
    var ci = 0
    while (ascii && ci < t.length) {
      if (t.charAt(ci) >= 0x80) ascii = false
      ci += 1
    }
    if (ascii) {
      val bytes = t.getBytes(StandardCharsets.ISO_8859_1)
      var i = 0
      while (i < n) {
        var h = 0xcbf29ce484222325L
        var j = i
        while (j < i + k) {
          h ^= (bytes(j) & 0xffL)
          h *= 0x100000001b3L
          j += 1
        }
        out(i) = h
        i += 1
      }
    } else {
      var i = 0
      while (i < n) { out(i) = fnv1a64(t.substring(i, i + k)); i += 1 }
    }
    out
  }

  /** Winnowing fingerprint RUNS — the canonical set form of winnowing
    * (Schleimer, Wilkerson, Aiken 2003: the fingerprint is the SELECTED
    * hashes, with positions): one row per run of consecutive windows
    * that picked the same gram. `(winStart, pos, hash)` where winStart
    * is the first window of the run, pos the selected gram's start
    * offset, hash its rolling FNV. Selection matches
    * [[rollingFingerprint]] exactly (window argmin, `<=` so the LATEST
    * index among ties wins, run-deduped); the scalar fingerprint is the
    * FNV-1a fold of these runs' hashes in order — pinned by spec.
    * Short texts (< k chars) degrade to one `(0, 0, fnv1a64(text))` row,
    * mirroring the scalar form's short-text case. */
  def winnowedRuns(text: String, k: Int = 16, w: Int = 8): Array[(Int, Int, Long)] = {
    val t = if (text == null) "" else text
    if (t.length < k) return Array((0, 0, fnv1a64(t)))
    val n = t.length - k + 1
    val grams = gramHashArray(t, k)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long)]
    var wi = 0
    var lastMinIdx = -1
    while (wi + w <= n) {
      var minIdx = wi
      var j = wi + 1
      while (j < wi + w) { if (grams(j) <= grams(minIdx)) minIdx = j; j += 1 }
      if (minIdx != lastMinIdx) {
        out += ((wi, minIdx, grams(minIdx)))
        lastMinIdx = minIdx
      }
      wi += 1
    }
    out.toArray
  }

  /** Per-position rolling k-gram hashes — the kernel layer under
    * [[winnowedRuns]], exported as the oracle aux artifact so the
    * window-argmin + run-dedupe selection can be replayed in SQL.
    * Short texts emit the `(-1, fnv1a64(text))` sentinel row. */
  def gramHashes(text: String, k: Int = 16): Array[(Int, Long)] = {
    val t = if (text == null) "" else text
    if (t.length < k) return Array((-1, fnv1a64(t)))
    val grams = gramHashArray(t, k)
    val out = new Array[(Int, Long)](grams.length)
    var i = 0
    while (i < grams.length) { out(i) = ((i, grams(i))); i += 1 }
    out
  }

  /** Winnowing-style document fingerprint: rolling FNV over character
    * k-grams (k=16), windowed minima (w=8), combined with FNV-1a over the
    * selected minima. Near-identical documents share most window minima, so
    * their fingerprints correlate under locality-sensitive banding of the
    * selected minima; this scalar form is the compact audit fingerprint. */
  def rollingFingerprint(text: String, k: Int = 16, w: Int = 8): Long = {
    val t = if (text == null) "" else text
    if (t.length < k) return fnv1a64(t)
    val n = t.length - k + 1
    val grams = gramHashArray(t, k)
    var combined = 0xcbf29ce484222325L
    var wi = 0
    var lastMinIdx = -1
    while (wi + w <= n) {
      var minIdx = wi
      var j = wi + 1
      while (j < wi + w) { if (grams(j) <= grams(minIdx)) minIdx = j; j += 1 }
      if (minIdx != lastMinIdx) {
        combined ^= grams(minIdx)
        combined *= 0x100000001b3L
        lastMinIdx = minIdx
      }
      wi += 1
    }
    combined
  }
}
