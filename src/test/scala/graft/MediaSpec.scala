package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.multimodal.MediaOps

/** Multimodal plumbing: schema, modality routing, stubbed decode and
  * feature extraction determinism, frame-sample explode shape. */
class MediaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mediaDf = {
    val rows = Seq(
      ("s3://bucket/cat.jpg", "img-bytes-1".getBytes("UTF-8")),
      ("s3://bucket/talk.mp3", "audio-bytes".getBytes("UTF-8")),
      ("s3://bucket/clip.mp4", "video-bytes".getBytes("UTF-8")),
      ("s3://bucket/notes.txt", "text-bytes".getBytes("UTF-8")))
    MediaOps.toMediaFrame(rows.toDF("path", "content"))
  }

  test("modality is derived from the extension; schema matches contract") {
    val m = mediaDf.select("path", "modality").as[(String, String)].collect().toMap
    assert(m("s3://bucket/cat.jpg") == "image")
    assert(m("s3://bucket/talk.mp3") == "audio")
    assert(m("s3://bucket/clip.mp4") == "video")
    assert(m("s3://bucket/notes.txt") == "other")
    // names+types match the contract (nullability differs via toDF)
    assert(mediaDf.schema.map(f => (f.name, f.dataType)) ==
      MediaOps.mediaSchema.map(f => (f.name, f.dataType)))
  }

  test("stub decode fills typed metadata deterministically") {
    val d1 = MediaOps.decode(mediaDf).orderBy("path").collect()
    val d2 = MediaOps.decode(mediaDf).orderBy("path").collect()
    assert(d1.sameElements(d2))
    val img = d1.find(_.getAs[String]("path").endsWith(".jpg")).get
    val meta = img.getAs[org.apache.spark.sql.Row]("meta")
    assert(meta.getAs[Int]("width") >= 64 && meta.getAs[String]("format") == "rgb8")
    assert(meta.getAs[Long]("duration_ms") == 0L)
  }

  test("feature extraction yields fixed-width deterministic float vectors") {
    val f = MediaOps.featureExtract(MediaOps.decode(mediaDf), dim = 16)
    val rows = f.collect()
    assert(rows.forall(_.getSeq[Float](1).length == 16))
    val again = MediaOps.featureExtract(MediaOps.decode(mediaDf), dim = 16)
    assert(rows.map(_.getSeq[Float](1)).toSet == again.collect().map(_.getSeq[Float](1)).toSet)
  }

  test("WAV codec: synthesize → parse round-trip, stats, graceful rejection") {
    import graft.multimodal.WavCodec
    val b = WavCodec.synthesize(seed = 7L, sampleRate = 8000, nSamples = 1600)
    val m = WavCodec.parse(b).get
    assert(m == WavCodec.WavMeta(8000, 1, 16, 1600))
    assert(m.durationMs == 200L)
    val (peak, rmsMilli) = WavCodec.pcm16Stats(b).get
    assert(peak > 0 && peak <= 32768)
    assert(rmsMilli > 0 && rmsMilli <= 1000)
    // same inputs → same bytes (the oracle replays this determinism)
    assert(java.util.Arrays.equals(b, WavCodec.synthesize(7L, 8000, 1600)))
    // rejection paths must be None, never a throw
    assert(WavCodec.parse("not a wav at all".getBytes("UTF-8")).isEmpty)
    assert(WavCodec.parse(b.take(30)).isEmpty)
    assert(WavCodec.parse(null).isEmpty)
  }

  test("decode parses a real WAV payload; non-WAV audio falls back to the fake") {
    import graft.multimodal.WavCodec
    val wav = WavCodec.synthesize(seed = 3L, sampleRate = 16000, nSamples = 3200)
    val rows = Seq(
      ("s3://bucket/voice.wav", wav),
      ("s3://bucket/talk.mp3", "not-a-riff-container".getBytes("UTF-8")))
    val d = MediaOps.decode(MediaOps.toMediaFrame(rows.toDF("path", "content")))
      .collect().map(r => r.getAs[String]("path") ->
        r.getAs[org.apache.spark.sql.Row]("meta")).toMap
    val real = d("s3://bucket/voice.wav")
    assert(real.getAs[Int]("width") == 16000)      // sample rate
    assert(real.getAs[Int]("height") == 1)         // channels
    assert(real.getAs[String]("format") == "pcm16")
    assert(real.getAs[Long]("duration_ms") == 200L)
    val fake = d("s3://bucket/talk.mp3")
    assert(fake.getAs[String]("format") == "pcm16")
    assert(fake.getAs[Long]("duration_ms") >= 1000L) // md5-fake range
  }

  test("frame sampling explodes video rows only") {
    val sampled = MediaOps.frameSample(MediaOps.decode(mediaDf), everyMs = 1000L)
    val byPath = sampled.groupBy("path").count().as[(String, Long)].collect().toMap
    assert(byPath("s3://bucket/cat.jpg") == 1L)
    assert(byPath("s3://bucket/clip.mp4") >= 2L)
    val frames = sampled.filter(col("path").endsWith(".mp4"))
      .select("frame_idx").as[Long].collect().sorted
    assert(frames.head == 0L && frames.toList == (0L until frames.length).toList)
  }
  test("WavCodec never throws on adversarial chunk sizes (offset wrap)") {
    import graft.multimodal.WavCodec
    val good = WavCodec.synthesize(seed = 5L, sampleRate = 8000, nSamples = 100)
    def put32(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
    }
    // declared fmt-chunk size near 2^31: without the truncation guard the
    // Int offset wraps negative, the walk re-enters and tag() throws
    val evilFmt = good.clone()
    put32(evilFmt, 16, Int.MaxValue - 20)
    assert(WavCodec.parse(evilFmt).isEmpty)   // data never reached -> None
    // declared data-chunk size near 2^31: clamped to the real remainder
    val evilData = good.clone()
    put32(evilData, 40, Int.MaxValue - 20)
    assert(WavCodec.parse(evilData).exists(_.nSamples == 100L))
    assert(WavCodec.pcm16Stats(evilData).isDefined)
    // and the whole 32-bit corner: size fields that clear the old
    // Int.MaxValue-16 rejection but still overflow the offset
    for (sz <- Seq(Int.MaxValue - 10, Int.MaxValue, -1 /* 0xFFFFFFFF */ )) {
      val e = good.clone(); put32(e, 16, sz)
      assert(WavCodec.parse(e).isEmpty)
    }
  }

  test("WavCodec total-function fuzz: arbitrary and mutated bytes never throw") {
    import graft.multimodal.WavCodec
    val rnd = new scala.util.Random(7L)
    // arbitrary garbage of tricky lengths (chunk-header boundaries)
    for (n <- Seq(0, 1, 12, 43, 44, 45, 51, 52, 100, 400); _ <- 1 to 20) {
      val b = new Array[Byte](n); rnd.nextBytes(b)
      WavCodec.parse(b); WavCodec.pcm16Stats(b)   // must not throw
    }
    // single-byte mutations of a VALID wav - header fields, chunk sizes,
    // tags; every mutant must parse to Some or None, never throw
    val good = WavCodec.synthesize(seed = 11L, sampleRate = 8000, nSamples = 64)
    for (_ <- 1 to 500) {
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      WavCodec.parse(b); WavCodec.pcm16Stats(b)
    }
    // multi-byte mutations concentrated on the two size fields
    for (_ <- 1 to 200) {
      val b = good.clone()
      val field = if (rnd.nextBoolean()) 16 else 40
      for (o <- 0 until 4) b(field + o) = rnd.nextInt(256).toByte
      WavCodec.parse(b); WavCodec.pcm16Stats(b)
    }
  }

  test("frameDedupPairs: re-encode, trim, df-capped boilerplate, stranger") {
    // clip A: frames f0..f4; B is a re-encode (same frames); C is A
    // trimmed to f0..f2; D is unrelated; every clip also carries the
    // 'intro' boilerplate sig shared by all 4 (df cap 3 < 4 drops it).
    def frames(path: String, sigs: Seq[String]) = sigs.map(s => (path, s))
    val df = (
      frames("a.mp4", Seq("f0", "f1", "f2", "f3", "f4", "intro")) ++
      frames("b.mp4", Seq("f0", "f1", "f2", "f3", "f4", "intro")) ++
      frames("c.mp4", Seq("f0", "f1", "f2", "intro")) ++
      frames("d.mp4", Seq("x0", "x1", "intro"))
    ).toDF("path", "sig")
    val got = MediaOps.frameDedupPairs(df, "path", "sig",
        dfCap = 3, minOverlapMilli = 800L)
      .orderBy("path_a", "path_b")
      .as[(String, String, Long, Long, Long)].collect().toList
    // a-b: shared 5, min 5 → overlap 1000, jaccard 1000
    // a-c and b-c: shared 3, min 3 → overlap 1000; union = 5+3-3 = 5
    // (intro df-capped away on BOTH sides) → jaccard 600
    // d pairs with nobody (intro was df-capped away)
    assert(got == List(
      ("a.mp4", "b.mp4", 5L, 1000L, 1000L),
      ("a.mp4", "c.mp4", 3L, 1000L, 600L),
      ("b.mp4", "c.mp4", 3L, 1000L, 600L)))
  }

}
