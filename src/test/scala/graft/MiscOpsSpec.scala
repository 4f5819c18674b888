package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{TextAnalysis, TopK}
import graft.sources.Sinks

/** Text-analytics, salted top-k, and per-key sink coverage. */
class MiscOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("langId picks the marker-dominant language with en-first tie-break") {
    val df = Seq(
      "the cat and the dog is here",
      "der hund und die katze ist das",
      "el gato es de los perros",
      "xyzzy plugh nothing",
      "the der"   // tie en=1/de=1 → en wins
    ).toDF("text")
    val got = df.select(TextAnalysis.langId($"text")).as[String].collect().toList
    assert(got == List("en", "de", "es", "und", "en"))
  }

  test("tokenStats and qualityScore count what they claim") {
    val df = Seq("the the quick fox 99").toDF("text")
    val stats = df.select(col("text") +: TextAnalysis.tokenStats($"text"): _*).collect()(0)
    assert(stats.getAs[Int]("n_tokens") == 5)
    assert(stats.getAs[Int]("n_uniq") == 4)
    assert(stats.getAs[Int]("n_alpha") == 5)
    val q = df.select(TextAnalysis.qualityScore($"text"): _*).collect()(0)
    assert(q.getAs[Int]("n_stop") == 2)
    // 0.7*(4/5) + 0.3*(2/5) = 0.68 → floor(68)
    assert(q.getAs[Long]("q_score") == 68L)
  }

  test("vocabCoverage: hand-computed cumulative shares, top-k cut") {
    val df = Seq((1L, "a a b"), (2L, "a b c")).toDF("doc_id", "text")
    // counts: a=3, b=2, c=1; total 6
    val got = TextAnalysis.vocabCoverage(df, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toList
    assert(got == List(
      (1L, "a", 3L, 500L),   // floor(1000·3/6)
      (2L, "b", 2L, 833L)))  // floor(1000·5/6)
  }

  test("lmScore: add-half bigram LM milli-nats, hand-computed") {
    val df = Seq((1L, "a b a"), (2L, "a b")).toDF("doc_id", "text")
    // unigrams: a=3 b=2, V=2; bigrams: (a,b)=2, (b,a)=1
    // lp(a,b) = floor(1000·ln(5/8))  = -471
    // lp(b,a) = floor(1000·ln(3/6))  = -694
    val rows = TextAnalysis.lmScore(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set((1L, 2L, -471L + -694L), (2L, 1L, -471L)))
  }

  test("int8 quantization: exact codes, zero dim, residual bound") {
    import graft.ops.Quantize
    val df = Seq(
      (1L, Array(1.0f, -0.5f, 0.0f)),
      (2L, Array(0.5f, 0.25f, 0.0f))).toDF("vec_id", "embedding")
    val got = Quantize.int8Codes(df, "vec_id", "embedding")
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    // dim0: s=1/127 → 1.0→127, 0.5→floor(63.5+0.5)=64
    // dim1: s=0.5/127 → -0.5→-127, 0.25→floor(63.5+0.5)=64
    // dim2: all-zero → 0
    assert(got == Map((1L, 0) -> 127L, (2L, 0) -> 64L,
      (1L, 1) -> -127L, (2L, 1) -> 64L, (1L, 2) -> 0L, (2L, 2) -> 0L))
    // residual bound: |x - q·s| ≤ s/2 → resid_milli ≤ 1000·s/2 < 4 milli
    val resid = Quantize.int8Codes(df, "vec_id", "embedding")
      .agg(max(col("resid_milli"))).collect()(0).getLong(0)
    assert(resid <= 4L)
  }

  test("two-phase salted top-k equals the plain window top-k") {
    val rnd = new scala.util.Random(3)
    val df = (1 to 5000).map(i => (s"g${i % 3}", rnd.nextDouble() * 100, i.toLong))
      .toDF("g", "value", "id")
    val salted = TopK.perGroup(df, Seq(col("g")),
        Seq(col("value").desc, col("id")), Seq(col("id")), k = 7)
      .select("g", "id", "rk").as[(String, Long, Int)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("value").desc, col("id"))
    val plain = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 7)
      .select("g", "id", "rk").as[(String, Long, Int)].collect().toSet
    assert(salted == plain)
  }

  test("profile: nulls, exact distincts, min/max per column in one pass") {
    val df = Seq((1, Some("a")), (2, None), (3, Some("a")), (3, Some("b")))
      .toDF("id", "v")
    val got = graft.ops.Profile.profile(df)
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("id") == ("id", 4L, 0L, 3L, "1", "3"))
    assert(got("v") == ("v", 4L, 1L, 2L, "a", "b"))
  }

  test("mergeUpsert: updates win, untouched master rows survive") {
    val master = Seq((1, "m1"), (2, "m2"), (3, "m3")).toDF("id", "text")
    val updates = Seq((2, "u2"), (4, "u4")).toDF("id", "text")
    val got = graft.ops.Fingerprint.mergeUpsert(master, updates, "id")
      .as[(Int, String)].collect().toSet
    assert(got == Set((1, "m1"), (2, "u2"), (3, "m3"), (4, "u4")))
  }

  test("writePerKeyJson lays out one directory per key") {
    val dir = java.nio.file.Files.createTempDirectory("perkey").toString
    val df = Seq(("k1", 1), ("k2", 2), ("k1", 3)).toDF("rag_id", "v")
    Sinks.writePerKeyJson(df, "rag_id", dir)
    val sub = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("rag_id=")).sorted
    assert(sub.toList == List("rag_id=k1", "rag_id=k2"))
    assert(spark.read.json(s"$dir/rag_id=k1").count() == 2)
  }

  test("approx_count_distinct stays within 5% of exact on the testdata") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (c <- Seq("doc_id", "source", "lang", "n_chars")) {
      val exact = docs.select(countDistinct(col(c))).as[Long].head()
      val approx = docs.select(approx_count_distinct(c)).as[Long].head()
      val rel = math.abs(approx - exact).toDouble / exact
      assert(rel <= 0.05, s"$c: approx=$approx exact=$exact rel=$rel")
    }
  }

  test("noveltyScore: clones score 0, unique docs 1000, short docs 0-of-0") {
    import graft.ops.TextAnalysis
    val df = Seq(
      (1L, "a b c d e"),   // clone of doc 2 → every gram shared → 0
      (2L, "a b c d e"),
      (3L, "p q r s t"),   // all grams unique → 1000
      (4L, "x y"))         // under 3 tokens → 0 grams
      .toDF("doc_id", "text")
    val got = TextAnalysis.noveltyScore(df, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 3L, 0L, 0L), (2L, 3L, 0L, 0L),
      (3L, 3L, 3L, 1000L), (4L, 0L, 0L, 0L)))
  }

  test("sketch merges equal full builds: cmsMerge and kmvMerge (unit-level)") {
    import graft.ops.Profile
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = docs.filter(col("doc_id") % 3 === 0)
    val b = docs.filter(col("doc_id") % 3 =!= 0)
    def occ(f: org.apache.spark.sql.DataFrame) =
      Profile.tokenOccurrences(f, col("doc_id"), col("text"))
    // CMS: union + re-sum of per-slice counters == counters of the union
    val merged = Profile.cmsMerge(Seq(
        Profile.cmsCounters(occ(a), "tok"), Profile.cmsCounters(occ(b), "tok")))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val full = Profile.cmsCounters(occ(docs), "tok")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged == full)
    // KMV: min-k over unioned min-k sets == min-k of the union
    val km = Profile.kmvMerge(Seq(
        Profile.kmvSketch(a, "doc_id"), Profile.kmvSketch(b, "doc_id")))
      .collect().map(_.getLong(0)).toSet
    val kf = Profile.kmvSketch(docs, "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(km == kf)
  }

  test("KMV distinct sketch: exact below k, within ~1/sqrt(k) above, deterministic") {
    import graft.ops.Profile
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val row = Profile.approxDistinctKmv(docs,
      Seq("doc_id", "source", "lang", "n_chars")).head()
    for ((c, i) <- Seq("doc_id", "source", "lang", "n_chars").zipWithIndex) {
      val exact = docs.select(countDistinct(col(c))).as[Long].head()
      val est = row.getLong(i)
      if (exact < 256) assert(est == exact, s"$c below k must be exact: $est vs $exact")
      else {
        val rel = math.abs(est - exact).toDouble / exact
        assert(rel <= 0.20, s"$c: kmv=$est exact=$exact rel=$rel") // ~3σ at k=256
      }
    }
    // md5 is seedless and min-k ignores row order → same answer again
    val again = Profile.approxDistinctKmv(docs.repartition(7),
      Seq("doc_id", "source", "lang", "n_chars")).head()
    assert(again == row)
  }

  test("funnelDepth: hand-built walks — conversion, order, window, greedy anchor") {
    import graft.ops.Funnel
    def ts(min: Int) = java.sql.Timestamp.valueOf(
      s"2026-01-01 ${10 + min / 60}:${"%02d".format(min % 60)}:00")
    val rows = Seq(
      // u1: full conversion in order, inside the window
      (1L, "view", ts(0)), (1L, "click", ts(10)), (1L, "purchase", ts(20)),
      // u2: click BEFORE view — must not count, depth stays 1
      (2L, "click", ts(0)), (2L, "view", ts(10)),
      // u3: purchase outside the 1h window of the anchor view
      (3L, "view", ts(0)), (3L, "click", ts(10)), (3L, "purchase", ts(70)),
      // u4: never entered (no view)
      (4L, "click", ts(0)), (4L, "purchase", ts(5)),
      // u5: greedy anchor — early lone view anchors the window, so the
      // click at +65min is outside it even though a later view exists
      (5L, "view", ts(0)), (5L, "view", ts(30)), (5L, "click", ts(65)),
      // u6: same-timestamp click as the view — strictly-after fails
      (6L, "view", ts(0)), (6L, "click", ts(0))
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel.funnelDepth(rows, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), windowSec = 3600L)
      .select("user_id", "depth").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 3, 2L -> 1, 3L -> 2, 5L -> 1, 6L -> 1))
  }

  test("rollingActives: trailing window counts distinct users, partial edges") {
    import graft.ops.Funnel
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2026-01-$day%02d 10:00:00")
    // u1 active d1,d2; u2 active d1; u3 active d5 (outside d1+2 window)
    val rows = Seq((1L, ts(1)), (1L, ts(2)), (1L, ts(2)), (2L, ts(1)),
      (3L, ts(5))).toDF("user_id", "ts")
    val got = Funnel.rollingActives(rows, "user_id", "ts", windowDays = 3)
      .select(date_format(col("window_end"), "yyyy-MM-dd"), col("n_active"))
      .as[(String, Long)].collect().toMap
    // observed days only: d1, d2, d5
    assert(got == Map(
      "2026-01-01" -> 2L,   // u1,u2 on day 1
      "2026-01-02" -> 2L,   // u1 and u2 both inside the trailing 3-day window
      "2026-01-05" -> 1L))  // only u3; u1/u2's days fell out of the window
  }

  test("langMix: per-sentence histogram, dominant share, tie-break") {
    import graft.ops.TextAnalysis
    val df = Seq(
      (1L, "the cat is here. der hund ist da. the dog is old."), // en 2, de 1
      (2L, "el gato es de los perros."),                          // es only
      (3L, "xyzzy plugh. qwerty!")                                // und ×2
    ).toDF("doc_id", "text")
    val got = TextAnalysis.langMix(df, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_segments"), r.getAs[Long]("n_langs"),
          r.getAs[String]("lang_dominant"), r.getAs[Long]("dominant_milli"))))
      .toMap
    assert(got(1L) == ((3L, 2L, "en", 666L)))
    assert(got(2L) == ((1L, 1L, "es", 1000L)))
    assert(got(3L) == ((2L, 1L, "und", 1000L)))
  }

  test("fleschMilli: hand-computed score, fragment guards") {
    import graft.ops.TextAnalysis
    val got = Seq("The cat. The dog!", "").toDF("text")
      .select(col("text") +: TextAnalysis.fleschMilli(col("text")): _*)
      .collect().map(r => (r.getAs[Long]("n_words"),
        r.getAs[Long]("n_sentences"), r.getAs[Long]("n_syllables"),
        r.getAs[Long]("flesch_milli")))
    // 4 words, 2 sentence runs, 4 vowel groups:
    // 206.835 − 1.015·(4/2) − 84.6·(4/4) = 120.205
    assert(got(0) == ((4L, 2L, 4L, 120205L)))
    // empty text: both denominators floored at 1, zero syllables
    val expectEmpty =
      math.floor(1000.0 * (206.835 - 1.015 * 1.0 / 1.0 - 84.6 * 0.0)).toLong
    assert(got(1) == ((1L, 1L, 0L, expectEmpty)))
  }

  test("rateAnomaly: trailing baseline excludes self, spike flagged") {
    import graft.ops.Funnel
    // one type, hourly buckets 0..3 with counts 9, 10, 11, 100
    val rows = Seq(0 -> 9, 1 -> 10, 2 -> 11, 3 -> 100).flatMap {
      case (b, cnt) => Seq.fill(cnt)(
        ("a", new java.sql.Timestamp(b * 3600L * 1000L + 10000L)))
    }.toDF("event_type", "ts")
    val got = Funnel.rateAnomaly(rows, "event_type", "ts",
      bucketSec = 3600L, trailBuckets = 24).collect()
      .map(r => r.getAs[Long]("bucket") ->
        ((r.getAs[Long]("n"), Option(r.getAs[Any]("z_milli")),
          r.getAs[Int]("spike")))).toMap
    assert(got(0L) == ((9L, None, 0)))   // no baseline
    assert(got(1L) == ((10L, None, 0)))  // single-point baseline
    // baseline {9,10}: mean 9.5, var 0.5 → z = 1500/√0.5 → 2121
    assert(got(2L) == ((11L, Some(2121L), 0)))
    // baseline {9,10,11}: mean 10, var 1 → z = 90000, spike
    assert(got(3L) == ((100L, Some(90000L), 1)))
  }

  test("newVsReturning: first-time vs returning split per day") {
    import graft.ops.Funnel
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2026-01-$day%02d 10:00:00")
    // u1 first on d1, returns d2; u2 first on d2; duplicate events collapse
    val rows = Seq((1L, ts(1)), (1L, ts(1)), (1L, ts(2)), (2L, ts(2)))
      .toDF("user_id", "ts")
    val got = Funnel.newVsReturning(rows, "user_id", "ts")
      .select(date_format(col("day"), "yyyy-MM-dd"), col("n_active"),
        col("n_new"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      "2026-01-01" -> ((1L, 1L)),
      "2026-01-02" -> ((2L, 1L))))
  }

  test("madZscorePerGroup: hand-computed MAD score, outlier-immune, constant group null") {
    import graft.ops.Profile
    // g1: values 10,10,10,10,1000 — med=10, |x-med| = 0,0,0,0,990 → MAD=0?
    // no: sorted deviations (0,0,0,0,990), median = 0 → degenerate. Use
    // 8,10,10,12,1000: med=10, devs (2,0,0,2,990) sorted (0,0,2,2,990),
    // MAD=2 → the 1000 outlier scores 0.6745*990/2 = 333.8775 → 333877
    // milli, while classic stddev-z would be dragged to ~1.78.
    val rows = Seq(
      ("g1", 1L, 8L), ("g1", 2L, 10L), ("g1", 3L, 10L), ("g1", 4L, 12L),
      ("g1", 5L, 1000L),
      ("g2", 6L, 7L), ("g2", 7L, 7L)   // constant group: MAD 0 → null
    ).toDF("grp", "id", "v")
    val got = Profile.madZscorePerGroup(rows, "grp", "v")
      .select("id", "rz_milli").as[(Long, Option[Long])].collect().toMap
    assert(got(5L).contains(333877L))
    assert(got(2L).contains(0L))
    assert(got(1L).contains(-675L))   // floor(1000*0.6745*(8-10)/2) = floor(-674.5)
    assert(got(6L).isEmpty && got(7L).isEmpty)
  }

  test("topPaths: ordered prefixes, tie-broken, short users keep short paths") {
    import graft.ops.Funnel
    def ts(min: Int) = java.sql.Timestamp.valueOf(
      s"2026-01-01 10:${"%02d".format(min)}:00")
    val rows = Seq(
      (1L, 10L, "view", ts(0)), (1L, 11L, "click", ts(1)), (1L, 12L, "buy", ts(2)),
      (1L, 13L, "view", ts(3)),                       // 4th event ignored
      (2L, 20L, "view", ts(0)), (2L, 21L, "click", ts(1)), (2L, 22L, "buy", ts(2)),
      // u3: two events at the SAME ts — event_id breaks the tie
      (3L, 31L, "b_second", ts(0)), (3L, 30L, "a_first", ts(0)),
      (4L, 40L, "solo", ts(5))                        // 1-event path
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = Funnel.topPaths(rows, "user_id", "event_type", "ts",
        "event_id", pathLen = 3, k = 10)
      .as[(String, Long)].collect().toSeq
    assert(got.head == (("view>click>buy", 2L)))      // most common first
    assert(got.contains(("a_first>b_second", 1L)))    // id-ordered tie
    assert(got.contains(("solo", 1L)))
  }

  test("retentionCohorts: hand-built cohort/offset matrix") {
    import graft.ops.Funnel
    def ts(day: Int, h: Int) = java.sql.Timestamp.valueOf(
      f"2026-01-${day}%02d $h%02d:00:00")
    val rows = Seq(
      (1L, ts(1, 9)), (1L, ts(1, 18)), (1L, ts(3, 9)),   // cohort d1: d0, d2
      (2L, ts(1, 10)), (2L, ts(2, 10)),                  // cohort d1: d0, d1
      (3L, ts(2, 11))                                    // cohort d2: d0
    ).toDF("user_id", "ts")
    val got = Funnel.retentionCohorts(rows, "user_id", "ts")
      .select(date_format(col("cohort"), "yyyy-MM-dd"), col("day_offset"),
        col("n_users"))
      .as[(String, Int, Long)].collect().toSet
    assert(got == Set(
      ("2026-01-01", 0, 2L),   // u1+u2 active on their first day
      ("2026-01-01", 1, 1L),   // u2 returns next day
      ("2026-01-01", 2, 1L),   // u1 returns two days later
      ("2026-01-02", 0, 1L)))  // u3's cohort
  }

  test("compactJsonl: tiny files merge to byte-sized partitions, rows survive") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact").toString
    try {
      // fragment: 25 files for 50 rows
      docs.repartition(25).write.mode("overwrite").json(s"$tmp/in")
      val inFiles = new java.io.File(s"$tmp/in").listFiles()
        .count(_.getName.startsWith("part-"))
      assert(inFiles == 25)
      val parts = Sinks.compactJsonl(spark, s"$tmp/in", s"$tmp/out",
        docs.schema, targetBytesPerFile = 64 * 1024)
      val outFiles = new java.io.File(s"$tmp/out").listFiles()
        .count(_.getName.startsWith("part-"))
      assert(outFiles == parts)
      assert(outFiles < inFiles, s"no compaction: $outFiles vs $inFiles")
      // sizing: ceil(totalBytes / target) partitions
      val total = spark.read.schema(docs.schema).json(s"$tmp/in")
        .select((length(to_json(struct(col("doc_id"), col("text")))) + 1)
          .cast("long").as("b"))
        .agg(sum("b")).as[Long].head()
      assert(parts == math.max(1, math.ceil(total / 65536.0).toInt))
      // row content survives the rewrite
      val a = docs.collect().map(_.toSeq).toSet
      val b = spark.read.schema(docs.schema).json(s"$tmp/out")
        .collect().map(_.toSeq).toSet
      assert(a == b)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(tmp)).deleteRecursively()
    }
  }

  test("heavyHittersCms: estimates bound true counts, catches the true top tokens") {
    import graft.ops.Profile
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val hh = Profile.heavyHittersCms(docs, col("doc_id"), col("text"), k = 20)
      .as[(String, Long)].collect()
    assert(hh.length == 20)
    // exact counts of the same token universe
    val exact = docs
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      .groupBy("tok").count().as[(String, Long)].collect().toMap
    val n = exact.values.sum
    hh.foreach { case (tok, est) =>
      val tru = exact(tok)
      assert(est >= tru, s"$tok: CMS $est under-estimates true $tru")
      // eps=1e-4 at 0.99 confidence; 20 tokens, so a miss is ~never
      assert(est <= tru + (1e-4 * n).toLong + 1, s"$tok: est $est too far above $tru")
    }
    // the exact top-5 must all be caught by the sample+sketch path
    val top5 = exact.toSeq.sortBy { case (t, c) => (-c, t) }.take(5).map(_._1).toSet
    assert(top5.subsetOf(hh.map(_._1).toSet),
      s"missed true heavy hitters: ${top5 -- hh.map(_._1).toSet}")
    // determinism
    val hh2 = Profile.heavyHittersCms(docs, col("doc_id"), col("text"), k = 20)
      .as[(String, Long)].collect()
    assert(hh.toSeq == hh2.toSeq)
  }

  test("halfLifeDecayScore: power-of-two decay at exact half-life steps") {
    import java.sql.Timestamp
    val h = 3600L * 1000
    val tRef = 1700000000000L
    val df = Seq(
      (1L, new Timestamp(tRef), 10.0),            // k=0 → 10000
      (1L, new Timestamp(tRef - 72 * h), 10.0),   // k=1 → 5000
      (1L, new Timestamp(tRef - 144 * h), 10.0),  // k=2 → 2500
      (1L, new Timestamp(tRef - 143 * h), 10.0),  // k=1 → 5000 (not yet 2 half-lives)
      (2L, new Timestamp(tRef - 720 * h), 8.0))   // k=10 → 8000 >> 10 = 7
    .toDF("user_id", "ts", "value")
    val got = graft.ops.Funnel.halfLifeDecayScore(df, "user_id", "ts",
        "value", halfLifeHours = 72L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == ((4L, 22500L)))
    assert(got(2L) == ((1L, 7L)))
  }

  test("rakeKeyphrases: hand-traced degree/freq scores, ties by phrase") {
    val df = Seq(
      (1L, "the quick brown fox and lazy dog in a deep sleep. quick brown fox"),
      (2L, "alpha beta. alpha gamma")).toDF("doc_id", "text")
    val got = TextAnalysis.rakeKeyphrases(df, "doc_id", "text", k = 3)
      .orderBy("doc_id", "rank")
      .as[(Long, Int, String, Long)].collect().toList
    // doc 1 phrases (distinct): "quick brown fox" (repeated → once),
    //   "lazy dog", "deep sleep"; every word freq 1, deg = phrase len →
    //   scores 9000 / 4000 / 4000; 4000-tie broken by phrase text
    // doc 2: alpha in both phrases → freq 2, deg 4 → wscore 2000;
    //   beta/gamma 2000 → both phrases 4000, tie by text
    assert(got == List(
      (1L, 1, "quick brown fox", 9000L),
      (1L, 2, "deep sleep", 4000L),
      (1L, 3, "lazy dog", 4000L),
      (2L, 1, "alpha beta", 4000L),
      (2L, 2, "alpha gamma", 4000L)))
  }
}
