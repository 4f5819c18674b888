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

  test("frame sampling explodes video rows only") {
    val sampled = MediaOps.frameSample(MediaOps.decode(mediaDf), everyMs = 1000L)
    val byPath = sampled.groupBy("path").count().as[(String, Long)].collect().toMap
    assert(byPath("s3://bucket/cat.jpg") == 1L)
    assert(byPath("s3://bucket/clip.mp4") >= 2L)
    val frames = sampled.filter(col("path").endsWith(".mp4"))
      .select("frame_idx").as[Long].collect().sorted
    assert(frames.head == 0L && frames.toList == (0L until frames.length).toList)
  }
}
