package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge.{toCol, toExpr}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.Sketches

/** Codegen-callable static entry points for the sketch expressions. */
object SketchRuntime {
  // coefficient table is deterministic (seed 42) and shared per-JVM
  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[(Long, Long)]]()
  private def coeffs(n: Int): Array[(Long, Long)] =
    coeffCache.computeIfAbsent(n, k => Sketches.minHashCoeffs(k))

  def minhash(t: UTF8String, shingleK: Int, numHashes: Int): GenericArrayData =
    new GenericArrayData(
      Sketches.minHashSignature(t.toString, shingleK, coeffs(numHashes)))

  def minhashFromHashes(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      numHashes: Int): GenericArrayData =
    new GenericArrayData(
      Sketches.minHashFromHashes(arr.toLongArray(), coeffs(numHashes)))

  def simhash(t: UTF8String): Long = Sketches.simHash64(t.toString)

  def hashedShingles(t: UTF8String, k: Int): GenericArrayData =
    new GenericArrayData(Sketches.hashedShingleSet(t.toString, k))

  def rollingFp(t: UTF8String): Long = Sketches.rollingFingerprint(t.toString)

  // Deflater holds native zlib state — reuse one per thread (reset()
  // between rows) instead of allocating/ending per call. Fixed level and
  // raw mode (nowrap) make the output length deterministic for a given
  // input across runs and partitionings.
  private val deflaters = ThreadLocal.withInitial[java.util.zip.Deflater](() =>
    new java.util.zip.Deflater(6, true))
  private val deflateBuf =
    ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](32 * 1024))

  // MessageDigest carries internal buffers — one per thread, reset per row
  private val md5s = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** 12-bit md5-prefix buckets of every whitespace unigram and adjacent
    * bigram of the SPACE-trimmed text, in one JVM pass. Bit-exact with
    * the SQL formulation the DSIR oracle replays —
    * `substring(md5(tok), 1, 3)` over
    * `concat(toks, zip_with(toks[:-1], toks[1:], (a,b) -> a || ' ' || b))`
    * with `toks = split(trim(text), '\\s+')` — under the int↔3-hex-char
    * bijection (first 12 bits of the digest = first 3 hex chars):
    * UTF8String.trim() strips 0x20 only, exactly like Spark's `trim`,
    * and Pattern.split(s, -1) keeps the leading "" token Spark's `split`
    * keeps (so "" and "\ta" bucket identically to the SQL form). The HOF
    * spelling interprets its lambdas per element (CodegenFallback) and
    * was the dominant term of the DSIR queries at 10× bench data. */
  def md5NgramBuckets(t: UTF8String): GenericArrayData = {
    val toks = wsPattern.split(t.trim().toString, -1)
    val md = md5s.get()
    def bkt(s: String): Int = {
      md.reset()
      val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ((d(0) & 0xff) << 4) | ((d(1) & 0xff) >>> 4)
    }
    val n = toks.length
    val out = new Array[Int](math.max(2 * n - 1, 0))
    var i = 0
    while (i < n) { out(i) = bkt(toks(i)); i += 1 }
    i = 0
    while (i < n - 1) { out(n + i) = bkt(toks(i) + " " + toks(i + 1)); i += 1 }
    new GenericArrayData(out)
  }
  private val wsPattern = java.util.regex.Pattern.compile("\\s+")

  // space-only trim, mirroring Spark's `trim` (UTF8String.trim strips
  // 0x20 and nothing else — Java String.trim would also strip \t/\n)
  private def spaceTrim(s: String): String = {
    var lo = 0; var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    s.substring(lo, hi)
  }

  /** Sliding token-window chunks: chunk i covers tokens
    * [i·stride, i·stride+size), i = 0 … ⌈n/stride⌉−1, joined by single
    * spaces — the one-pass twin of the `transform(sequence(...),
    * i -> concat_ws(" ", slice(toks, i·stride+1, size)))` HOF spelling
    * (CodegenFallback, re-slices the token array per chunk interpreted).
    * Tokenization matches `split(trim(text), "\\s+")`: space-only trim,
    * leading "" token kept for "\t..."-shaped input, n ≥ 1 always (""
    * yields the single chunk ""). */
  def chunkWindows(t: UTF8String, size: Int, stride: Int): GenericArrayData = {
    val toks = wsPattern.split(t.trim().toString, -1)
    val n = toks.length
    val nChunks = (n + stride - 1) / stride
    val out = new Array[Any](math.max(nChunks, 1))
    var i = 0
    while (i < out.length) {
      val from = i * stride
      val to = math.min(from + size, n)
      val sb = new java.lang.StringBuilder()
      var j = from
      while (j < to) {
        if (j > from) sb.append(' ')
        sb.append(toks(j)); j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** First 15 md5 hex digits of the key as a 60-bit non-negative long —
    * the [[graft.ops.Sampling.hashBucket]] value before its `% mod`,
    * bit-exact with `conv(substring(md5(k), 1, 15), 16, 10)` (7 full
    * digest bytes then the high nibble of byte 7) without materializing
    * the hex string or parsing it back. */
  def md5Prefix60(t: UTF8String): Long = md5Prefix60Bytes(t.getBytes)

  def md5Prefix60Bytes(b: Array[Byte]): Long = {
    val md = md5s.get()
    md.reset()
    val d = md.digest(b)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }

  /** The d CMS bucket indices of one item in one JVM pass: bucket_i =
    * (16-bit big-endian slice i of md5(item)) mod w — bit-exact with the
    * SQL spelling `conv(substring(md5(item), 1+4i, 4), 16, 10) % w` the
    * sketch oracle replays (4 hex chars = 2 digest bytes), without
    * materializing the 32-char hex string or running d string
    * conversions per occurrence. */
  def cmsBuckets(item: UTF8String, w: Int, d: Int): GenericArrayData = {
    val md = md5s.get()
    md.reset()
    val dig = md.digest(item.getBytes)
    val out = new Array[Long](d)
    var i = 0
    while (i < d) {
      out(i) = (((dig(2 * i) & 0xff) << 8) | (dig(2 * i + 1) & 0xff)) % w
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-doc DISTINCT winnowed run hashes ([[Sketches.winnowedRuns]]'s
    * `_3` column deduped inside the kernel): the winnow-overlap pair
    * join only consumes (id, h) distinct, so deduping per doc here
    * removes both the Scala-UDF row conversion and the corpus-wide
    * DISTINCT shuffle that the struct-array UDF spelling paid. */
  def winnowedHashSet(t: UTF8String): GenericArrayData = {
    val runs = Sketches.winnowedRuns(t.toString)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < runs.length) { seen.add(runs(i)._3); i += 1 }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** ALL full-window n-grams (stride 1, NOT distinct, order kept) of the
    * `split(trim(text), "\\s+")` token stream, joined by single spaces —
    * the shared gram generator for the repetition / PMI / bigram-LM /
    * span-coverage ops, replacing their per-site
    * `transform(sequence(...), i -> concat_ws(...))` spellings
    * (CodegenFallback, interpreted per gram). < n tokens → empty. */
  def slidingGrams(t: UTF8String, n: Int): GenericArrayData = {
    val toks = wsPattern.split(t.trim().toString, -1)
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](toks.length - n + 1)
      var i = 0
      while (i < out.length) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  private val paraPattern = java.util.regex.Pattern.compile("\n{2,}")

  /** Paragraph→chunk assignment by cumulative token budget: split on
    * blank lines, space-trim, drop empties; paragraph p lands in chunk
    * ⌊tokens_before_p / maxTokens⌋. One JVM pass replacing the
    * interpreted transform/filter/aggregate/zip_with cumsum spelling.
    * Returns array<struct<chunk_idx:int, para:string>> in paragraph
    * order. */
  def paragraphChunks(t: UTF8String, maxTokens: Int): GenericArrayData = {
    val paras = paraPattern.split(t.toString, -1)
    val out = new scala.collection.mutable.ArrayBuffer[Any](paras.length)
    var off = 0L
    var i = 0
    while (i < paras.length) {
      val p = spaceTrim(paras(i))
      if (p.nonEmpty) {
        val nToks = wsPattern.split(p, -1).length
        out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any]((off / maxTokens).toInt, UTF8String.fromString(p)))
        off += nToks
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Distinct k-token shingles under the SQL-oracle tokenization: split
    * on the literal single space KEEPING empty tokens (DuckDB
    * `string_split(text, ' ')` / Spark `split(text, " ")` semantics —
    * "a  b" yields ["a","","b"] and the shingle "a  b"), full windows
    * only (< k tokens → empty array), first-occurrence-distinct. This is
    * the oracle-parity twin of [[graft.ops.Sketches.tokenShingles]]
    * (which \s+-tokenizes); it replaces the flatten/transform HOF
    * spelling whose interpreted lambdas dominated the shingle-explode
    * queries at 10× bench data. */
  def tokenShinglesSpaceSplit(t: UTF8String, k: Int): GenericArrayData = {
    val w = t.toString.split(" ", -1)
    if (w.length < k) new GenericArrayData(Array.empty[Any])
    else {
      val out = new java.util.LinkedHashSet[UTF8String]()
      var i = 0
      while (i + k <= w.length) {
        val sb = new java.lang.StringBuilder(w(i))
        var j = 1
        while (j < k) { sb.append(' ').append(w(i + j)); j += 1 }
        out.add(UTF8String.fromString(sb.toString))
        i += 1
      }
      new GenericArrayData(out.toArray())
    }
  }

  def deflateLen(t: UTF8String): Long = {
    val in = t.getBytes
    val d = deflaters.get()
    d.reset()
    d.setInput(in)
    d.finish()
    val buf = deflateBuf.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}

/** Plan-time string-input check shared by the text kernels (with
  * split()-style implicit atomic→string casts, so e.g. an int column
  * tokenizes exactly as the HOF spellings these kernels replaced did) —
  * without it a non-string child passed analysis and then crashed
  * inside codegen mid-job. */
private[expr] trait StringInputKernel extends ImplicitCastInputTypes {
  self: Expression =>
  // inferred result type: AbstractDataType is private[sql]
  override def inputTypes = Seq(StringType)
}

/** `minhash_signature(text)` → array<bigint> of length `numHashes`. */
case class MinHashSignatureExpr(child: Expression, shingleK: Int = 3,
    numHashes: Int = 64) extends UnaryExpression with StringInputKernel {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(t: Any): Any =
    SketchRuntime.minhash(t.asInstanceOf[UTF8String], shingleK, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"graft.expr.SketchRuntime.minhash($t, $shingleK, $numHashes)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `minhash_from_hashes(hs)` → array<bigint> signature over an ALREADY
  * shingle-hashed set (the (id, len, n, hs) sketch the Jaccard
  * candidate layer carries) — bit-identical to
  * [[MinHashSignatureExpr]] on the originating text, because `hs`
  * elements ARE the fnv1a64 shingle hashes minHashSignature permutes
  * (pinned in SketchesSpec). Lets CandidateGen's occupancy degrade
  * band a sketch without re-shingling the corpus. */
case class MinHashFromHashesExpr(child: Expression, numHashes: Int = 64)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    SketchRuntime.minhashFromHashes(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.expr.SketchRuntime.minhashFromHashes($a, $numHashes)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `hashed_shingles(text, k)` → sorted array<bigint> of distinct
  * k-token-shingle hashes (single JVM pass; the HOF formulation
  * `array_sort(transform(shingles, xxhash64))` interprets its lambdas
  * per element and destabilized the pair-join stages). */
case class HashedShinglesExpr(child: Expression, shingleK: Int = 3)
    extends UnaryExpression with StringInputKernel {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(t: Any): Any =
    SketchRuntime.hashedShingles(t.asInstanceOf[UTF8String], shingleK)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"graft.expr.SketchRuntime.hashedShingles($t, $shingleK)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `md5_ngram_buckets(text)` → array<int> of 12-bit md5-prefix buckets
  * over unigrams + adjacent bigrams (the DSIR feature stream — see
  * [[SketchRuntime.md5NgramBuckets]] for the exact-parity contract). */
case class Md5NgramBucketsExpr(child: Expression) extends UnaryExpression with StringInputKernel {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def nullSafeEval(t: Any): Any =
    SketchRuntime.md5NgramBuckets(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.expr.SketchRuntime.md5NgramBuckets($t)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `token_shingles(text, k)` → array<string> of distinct k-token
  * shingles, space-split with empties kept (see
  * [[SketchRuntime.tokenShinglesSpaceSplit]] for the parity contract). */
case class TokenShinglesExpr(child: Expression, shingleK: Int = 3)
    extends UnaryExpression with StringInputKernel {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(t: Any): Any =
    SketchRuntime.tokenShinglesSpaceSplit(t.asInstanceOf[UTF8String], shingleK)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"graft.expr.SketchRuntime.tokenShinglesSpaceSplit($t, $shingleK)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `md5_prefix60(key)` → bigint: first 15 md5 hex digits as a 60-bit
  * value (see [[SketchRuntime.md5Prefix60]]). Accepts the same key
  * domain as Spark's own `md5`: string (UTF-8 bytes hashed) or binary
  * (raw bytes) — anything else is a plan-time AnalysisException, never
  * a mid-job codegen crash. */
case class Md5Prefix60Expr(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes =
    org.apache.spark.sql.graftbridge.ColumnBridge.stringOrBinaryInput
  override def dataType: DataType = LongType
  override protected def nullSafeEval(t: Any): Any = t match {
    case s: UTF8String => SketchRuntime.md5Prefix60(s)
    case b: Array[Byte] => SketchRuntime.md5Prefix60Bytes(b)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case BinaryType => defineCodeGen(ctx, ev,
        t => s"graft.expr.SketchRuntime.md5Prefix60Bytes($t)")
      case _ => defineCodeGen(ctx, ev,
        t => s"graft.expr.SketchRuntime.md5Prefix60($t)")
    }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `cms_buckets(item, w, d)` → array<bigint> of the item's d count-min
  * bucket indices (see [[SketchRuntime.cmsBuckets]]). */
case class CmsBucketsExpr(child: Expression, w: Int, d: Int)
    extends UnaryExpression with StringInputKernel {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(t: Any): Any =
    SketchRuntime.cmsBuckets(t.asInstanceOf[UTF8String], w, d)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.expr.SketchRuntime.cmsBuckets($t, $w, $d)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `winnowed_hash_set(text)` → array<bigint> of per-doc distinct
  * winnowed run hashes (see [[SketchRuntime.winnowedHashSet]]). */
case class WinnowedHashSetExpr(child: Expression) extends UnaryExpression with StringInputKernel {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(t: Any): Any =
    SketchRuntime.winnowedHashSet(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.expr.SketchRuntime.winnowedHashSet($t)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `sliding_grams(text, n)` → array<string> of ALL full-window n-grams
  * (see [[SketchRuntime.slidingGrams]]). */
case class SlidingGramsExpr(child: Expression, n: Int)
    extends UnaryExpression with StringInputKernel {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(t: Any): Any =
    SketchRuntime.slidingGrams(t.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.expr.SketchRuntime.slidingGrams($t, $n)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `chunk_windows(text, size, stride)` → array<string> of sliding
  * token-window chunks (see [[SketchRuntime.chunkWindows]]). */
case class ChunkWindowsExpr(child: Expression, size: Int, stride: Int)
    extends UnaryExpression with StringInputKernel {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(t: Any): Any =
    SketchRuntime.chunkWindows(t.asInstanceOf[UTF8String], size, stride)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"graft.expr.SketchRuntime.chunkWindows($t, $size, $stride)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `paragraph_chunks(text, maxTokens)` →
  * array<struct<chunk_idx:int, para:string>>
  * (see [[SketchRuntime.paragraphChunks]]). */
case class ParagraphChunksExpr(child: Expression, maxTokens: Int)
    extends UnaryExpression with StringInputKernel {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_idx", IntegerType, nullable = false),
    StructField("para", StringType, nullable = false))), containsNull = false)
  override protected def nullSafeEval(t: Any): Any =
    SketchRuntime.paragraphChunks(t.asInstanceOf[UTF8String], maxTokens)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"graft.expr.SketchRuntime.paragraphChunks($t, $maxTokens)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `simhash64(text)` → bigint. */
case class SimHash64Expr(child: Expression) extends UnaryExpression with StringInputKernel {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(t: Any): Any =
    SketchRuntime.simhash(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.expr.SketchRuntime.simhash($t)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `rolling_fingerprint(text)` → bigint (winnowing-style doc fingerprint). */
case class RollingFingerprintExpr(child: Expression) extends UnaryExpression with StringInputKernel {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(t: Any): Any =
    SketchRuntime.rollingFp(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.expr.SketchRuntime.rollingFp($t)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `deflate_len(text)` → bigint: zlib-deflated byte length of the UTF-8
  * text (level 6, raw). The compressed/raw ratio is the classic one-pass
  * "natural language vs boilerplate/spam" signal (RefinedWeb, Dolma use
  * it as a repetition gate): machine-generated or template text deflates
  * far below prose. A per-row JVM kernel beats any SQL formulation —
  * there is none — and stays inside whole-stage codegen. */
case class DeflateLenExpr(child: Expression) extends UnaryExpression with StringInputKernel {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(t: Any): Any =
    SketchRuntime.deflateLen(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.expr.SketchRuntime.deflateLen($t)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object sketchFunctions {
  def deflate_len(c: Column): Column = toCol(DeflateLenExpr(toExpr(c)))
  def minhash_signature(c: Column, shingleK: Int = 3, numHashes: Int = 64): Column =
    toCol(MinHashSignatureExpr(toExpr(c), shingleK, numHashes))
  def minhash_from_hashes(c: Column, numHashes: Int = 64): Column =
    toCol(MinHashFromHashesExpr(toExpr(c), numHashes))
  def simhash64(c: Column): Column = toCol(SimHash64Expr(toExpr(c)))
  def hashed_shingles(c: Column, shingleK: Int = 3): Column =
    toCol(HashedShinglesExpr(toExpr(c), shingleK))
  def rolling_fingerprint(c: Column): Column = toCol(RollingFingerprintExpr(toExpr(c)))
  def md5_ngram_buckets(c: Column): Column = toCol(Md5NgramBucketsExpr(toExpr(c)))
  def token_shingles(c: Column, shingleK: Int = 3): Column =
    toCol(TokenShinglesExpr(toExpr(c), shingleK))
  def md5_prefix60(c: Column): Column = toCol(Md5Prefix60Expr(toExpr(c)))
  def cms_buckets(c: Column, w: Int, d: Int): Column =
    toCol(CmsBucketsExpr(toExpr(c), w, d))
  def winnowed_hash_set(c: Column): Column =
    toCol(WinnowedHashSetExpr(toExpr(c)))
  def sliding_grams(c: Column, n: Int): Column =
    toCol(SlidingGramsExpr(toExpr(c), n))
  def chunk_windows(c: Column, size: Int, stride: Int): Column =
    toCol(ChunkWindowsExpr(toExpr(c), size, stride))
  def paragraph_chunks(c: Column, maxTokens: Int): Column =
    toCol(ParagraphChunksExpr(toExpr(c), maxTokens))
}
