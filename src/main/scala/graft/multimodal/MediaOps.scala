package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Sketches

/** Multimodal columns for a training-data pipeline (builder-prompt
  * extension family): image/audio/video as opaque `binary` columns with
  * typed metadata, plus decode / feature-extract / frame-sample stages.
  *
  * Audio decodes for REAL: [[WavCodec]] is a pure-JVM RIFF/WAVE PCM
  * parser (header walk + data-chunk duration + PCM stats). Image/video
  * decode stays behind a deterministic md5-derived fake — this container
  * has no codec libraries — but everything Spark-side is real and
  * tested: the schema, the per-partition batching shape (the Scala
  * analogue of `mapInPandas`: one decoder handle per partition, rows
  * streamed through it), partition sizing by byte weight, and the
  * explode-shaped frame sampler.
  *
  * 100 TB notes: binary payloads ride in the row (parquet binary column);
  * `repartitionByBytes` keeps partitions near the target size so executor
  * memory is bounded by bytes not row counts; features are fixed-width
  * float arrays (columnar, prunable) so downstream ANN (graft.ops.Vectors)
  * runs without touching the payload column again.
  */
object MediaOps {

  val mediaSchema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("format", StringType),
      StructField("duration_ms", LongType))))))

  /** Modality from file extension (image/audio/video/other). */
  def modalityOf(path: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val ext = lower(regexp_extract(path, "\\.([A-Za-z0-9]+)$", 1))
    when(ext.isin("jpg", "jpeg", "png", "gif", "webp"), "image")
      .when(ext.isin("wav", "mp3", "flac", "ogg"), "audio")
      .when(ext.isin("mp4", "avi", "mkv", "webm"), "video")
      .otherwise("other")
  }

  /** binaryFile scan → media frame with modality + empty metadata. */
  def toMediaFrame(binaries: DataFrame): DataFrame =
    binaries.select(
      col("path"),
      modalityOf(col("path")).as("modality"),
      col("content"),
      struct(lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(null).cast("string").as("format"),
        lit(null).cast("long").as("duration_ms")).as("meta"))

  /** Decoded metadata row contract. */
  case class Decoded(path: String, modality: String, content: Array[Byte],
      width: Int, height: Int, format: String, duration_ms: Long)

  /** STUB decode — deterministic fake dimensions derived from the payload
    * hash; a real deployment swaps `decodeOne` for a codec call. The
    * mapPartitions shape (decoder init once per partition, rows streamed)
    * is the real contract being exercised. */
  def decode(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val ds = media.select(col("path"), col("modality"), col("content"))
      .as[(String, String, Array[Byte])]
    ds.mapPartitions { it =>
      // per-partition decoder handle would be initialized here
      it.map { case (path, modality, bytes) => decodeOne(path, modality, bytes) }
    }.toDF()
      .select(col("path"), col("modality"), col("content"),
        struct(col("width"), col("height"), col("format"),
          col("duration_ms")).as("meta"))
  }

  private def decodeOne(path: String, modality: String, bytes: Array[Byte]): Decoded = {
    val b = if (bytes == null) Array.empty[Byte] else bytes
    // REAL codec for audio: a well-formed RIFF/WAVE payload is parsed
    // byte-level ([[WavCodec]]) — sample rate lands in `width`, channel
    // count in `height` (the meta struct is shaped by the image case;
    // audio reuses the two int slots), duration from the data chunk.
    if (modality == "audio") {
      WavCodec.parse(b) match {
        case Some(m) =>
          return Decoded(path, modality, b, m.sampleRate, m.channels,
            s"pcm${m.bitsPerSample}", m.durationMs)
        case None => // not a WAV container — fall through to the fake
      }
    }
    // image/video (and undecodable audio) keep a deterministic fake —
    // no codec libraries in this container. The fake is the first 60
    // bits of md5(payload): one pass over the bytes (same cost class as
    // any hash) and replayable by the SQL oracle as
    // CAST('0x' || substr(md5(text), 1, 15) AS UBIGINT), which is what
    // lets media_pipeline be hash-checked end to end.
    val hex = java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString.substring(0, 15)
    val h = java.lang.Long.parseLong(hex, 16) // 60 bits, non-negative
    val w = 64 + (h % 1920L).toInt
    val ht = 64 + ((h / 2048L) % 1080L).toInt
    val fmt = modality match {
      case "image" => "rgb8"
      case "audio" => "pcm16"
      case "video" => "yuv420"
      case _ => "bin"
    }
    val dur = if (modality == "image") 0L else 1000L + (h / 8388608L) % 60000L
    Decoded(path, modality, b, w, ht, fmt, dur)
  }

  /** STUB feature extraction: fixed-width float embedding per row,
    * deterministic from content bytes (stands in for a vision/audio
    * encoder). Output column is `array<float>` ready for
    * [[graft.ops.Vectors]] ANN. */
  def featureExtract(decoded: DataFrame, dim: Int = 16): DataFrame = {
    val spark = decoded.sparkSession
    import spark.implicits._
    val ds = decoded.select(col("path"), col("content")).as[(String, Array[Byte])]
    ds.mapPartitions { it =>
      it.map { case (path, bytes) =>
        val b = if (bytes == null) Array.empty[Byte] else bytes
        // ONE pass over the payload, then a cheap per-dim mix — the old
        // per-dim rehash was O(dim·payload) with a String copy per dim
        val base = Sketches.fnv1a64Masked(b)
        val feats = Array.tabulate(dim) { i =>
          var h = base ^ (0x9e3779b97f4a7c15L * (i + 1))
          h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
          h ^= h >>> 27; h *= 0x94d049bb133111ebL
          h ^= h >>> 31
          (math.floorMod(h, 2000L) - 1000L).toFloat / 1000.0f
        }
        (path, feats)
      }
    }.toDF("path", "features")
  }

  /** Frame sampling for video rows: one output row per sampled frame at a
    * fixed stride (explode-shaped generator; non-video rows pass through
    * with frame_idx 0). */
  def frameSample(decoded: DataFrame, everyMs: Long = 1000L): DataFrame = {
    val n = when(col("modality") === "video",
      greatest(lit(1L), col("meta.duration_ms") / everyMs)).otherwise(lit(1L))
    decoded
      .withColumn("frame_idx", explode(sequence(lit(0L), n.cast("long") - 1)))
      .withColumn("frame_ts_ms", col("frame_idx") * everyMs)
      .drop("content")
  }

  /** Byte-weighted repartition: target partitions sized by payload bytes
    * (not row count) so a few huge videos can't blow an executor. */
  def repartitionByBytes(media: DataFrame, targetBytesPerPartition: Long): DataFrame = {
    val stats = media.agg(sum(length(col("content"))).as("total")).collect()(0)
    val total = if (stats.isNullAt(0)) 0L else stats.getLong(0)
    val parts = math.max(1, (total / math.max(1L, targetBytesPerPartition)).toInt)
    media.repartition(parts)
  }

  /** Cross-video duplicate detection from sampled-frame signatures —
    * the multimodal sibling of [[graft.ops.Dedup.winnowOverlapPairs]]:
    * re-encodes, re-uploads, and trimmed copies of one clip share their
    * frame signatures, so a df-capped inverted index over (path, sig)
    * surfaces the pairs without any video ever comparing to another
    * directly.
    *
    * Output per surviving pair: shared frame count, overlap coefficient
    * vs the SMALLER clip (milli — a trimmed copy scores 1000, the
    * containment semantics), and frame Jaccard (milli — trims score
    * below 1000, full re-encodes exactly 1000).
    *
    * Scale shape: `distinct` + df-count + self-join all key on the
    * signature; the df cap (intro cards / black frames / station logos
    * shared by thousands of clips) bounds every posting list, making
    * the pair fan-out linear in occurrences — the same guarantee as the
    * containment index. The final stats join keys on the path. */
  def frameDedupPairs(frames: DataFrame, pathCol: String, sigCol: String,
      dfCap: Int, minOverlapMilli: Long): DataFrame = {
    // MATERIALIZED (eager, serialized — the transient-table rule): occ
    // feeds both the df-cap aggregate and the keep join, kept feeds the
    // size table and BOTH pair-join sides — left lazy, every reference
    // re-evaluates the caller's frame derivation (measured at sf0.1:
    // the media_frame_dedup upstream appeared 8× in one plan, 16
    // parquet scans — at corpus scale 8 decode/signature passes).
    // Both tables are narrow (path, sig) rows, far cheaper stored once
    // than recomputed per branch.
    val occ = frames.select(col(pathCol).as("path"), col(sigCol).as("sig"))
      .distinct()
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val kept = occ.join(
      occ.groupBy("sig").agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= dfCap).select("sig"),
      Seq("sig"))
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val sz = kept.groupBy("path").agg(count(lit(1)).as("n"))
    val a = kept.select(col("sig"), col("path").as("path_a"))
    val b = kept.select(col("sig"), col("path").as("path_b"))
    a.join(b, Seq("sig")).filter(col("path_a") < col("path_b"))
      .groupBy("path_a", "path_b").agg(count(lit(1)).as("shared_frames"))
      .join(sz.toDF("path_a", "n_a"), "path_a")
      .join(sz.toDF("path_b", "n_b"), "path_b")
      .select(col("path_a"), col("path_b"), col("shared_frames"),
        expr("1000 * shared_frames div least(n_a, n_b)").as("overlap_milli"),
        expr("1000 * shared_frames div (n_a + n_b - shared_frames)")
          .as("jaccard_milli"))
      .filter(col("overlap_milli") >= minOverlapMilli)
  }
}
