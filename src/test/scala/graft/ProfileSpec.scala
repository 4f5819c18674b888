package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Profile

/** Histogram bucket-edge arithmetic and the GK approx-quantile error
  * contract (zscore/MAD/profile/CMS live in MiscOpsSpec). */
class ProfileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("histogramInt: integer bucket edges, under/overflow buckets") {
    // lo=0 hi=100 nBins=4 → interior edges at 25/50/75
    val df = Seq(-5L, 0L, 24L, 25L, 49L, 50L, 99L, 100L, 140L)
      .toDF("v")
    val got = Profile.histogramInt(df, "v", 0L, 100L, 4).collect()
      .map(r => r.getAs[Int]("bin") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("v_min"), r.getAs[Long]("v_max"))))
      .toMap
    assert(got == Map(
      0 -> ((1L, -5L, -5L)),       // underflow
      1 -> ((2L, 0L, 24L)),        // [0, 25)
      2 -> ((2L, 25L, 49L)),       // [25, 50)
      3 -> ((1L, 50L, 50L)),       // [50, 75)
      4 -> ((1L, 99L, 99L)),       // [75, 100)
      5 -> ((2L, 100L, 140L))))    // overflow
  }

  test("histogramInt drops nulls") {
    val df = Seq(Option(5L), None, Option(7L)).toDF("v")
    val got = Profile.histogramInt(df, "v", 0L, 10L, 1).collect()
    assert(got.map(_.getAs[Long]("n")).sum == 2L)
  }

  test("datasetDigest: order-free, change-sensitive, null-vs-empty distinct") {
    import graft.ops.Profile
    def digest(rows: Seq[(Long, Option[String])]): (Long, Long) = {
      val r = Profile.datasetDigest(rows.toDF("id", "v"), Seq("id", "v"))
        .collect().head
      (r.getAs[Long]("n_rows"), r.getAs[Long]("digest"))
    }
    val base = Seq(1L -> Option("a"), 2L -> Option("b"), 3L -> Option("c"))
    assert(digest(base) == digest(base.reverse))          // row order free
    assert(digest(base) != digest(base.updated(0, 1L -> Option("z"))))
    assert(digest(Seq(1L -> None)) != digest(Seq(1L -> Option(""))))
  }

  test("keySkew: hand-computed balance ratio and top-k share") {
    // keys: a×6, b×2, c×1, d×1 → 4 keys, 10 rows, max 6
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d"))
      .toDF("k")
    val r = graft.ops.Profile.keySkew(df, "k", k = 2).collect().head
    assert(r.getAs[Long]("n_keys") == 4L)
    assert(r.getAs[Long]("n_rows") == 10L)
    assert(r.getAs[Long]("max_key_rows") == 6L)
    assert(r.getAs[Long]("skew_ratio_milli") == 2400L) // 6·4·1000/10
    assert(r.getAs[Long]("top_share_milli") == 800L)   // (6+2)/10
  }

  test("profileDrift: flags trip exactly when the snapshot moved") {
    val cur = Seq((1L, Option("a")), (2L, Option("b")), (3L, Option("b")),
      (4L, None)).toDF("id", "tag")
    val prior = Seq((1L, Option("a")), (2L, Option("a"))).toDF("id", "tag")
    val got = graft.ops.Profile.profileDrift(cur, prior, Seq("id", "tag"))
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    // id: range 1-4 vs 1-2 → minmax; distinct/rows ratio 1.0 both → no
    // dist drift; nulls 0 both → no null drift
    assert(got("id").getAs[Int]("minmax_changed") == 1)
    assert(got("id").getAs[Int]("dist_drift") == 0)
    assert(got("id").getAs[Int]("null_drift") == 0)
    // tag: max b vs a → minmax; distinct ratio 2/4 vs 1/2 → equal, no
    // dist drift; null ratio 1/4 vs 0/2 → new nulls → drift
    assert(got("tag").getAs[Int]("minmax_changed") == 1)
    assert(got("tag").getAs[Int]("dist_drift") == 0)
    assert(got("tag").getAs[Int]("null_drift") == 1)
    assert(got("tag").getAs[Long]("rows_cur") == 4L)
    assert(got("tag").getAs[Long]("rows_prev") == 2L)
  }

  test("approxQuantilesPerGroup: rank error within n/accuracy, monotone") {
    // uniform 0..9999 → exact p50=4999/5000 region; accuracy 10000 ⇒
    // rank error ≤ 1, so values land within a hair of the true quantile
    val df = (0 until 10000).map(i => ("g", i.toLong)).toDF("src", "v")
    val got = Profile.approxQuantilesPerGroup(df, "src", "v",
      Seq(0.5, 0.9, 0.99)).collect()
      .map(r => r.getAs[Int]("prob_pct") -> r.getAs[Long]("q_approx")).toMap
    assert(math.abs(got(50) - 5000L) <= 10L)
    assert(math.abs(got(90) - 9000L) <= 10L)
    assert(math.abs(got(99) - 9900L) <= 10L)
    assert(got(50) <= got(90) && got(90) <= got(99))
  }

  test("approxQuantilesPerGroup is deterministic across runs") {
    val df = (0 until 5000).map(i => (s"s${i % 3}", (i * 37 % 1000).toLong))
      .toDF("src", "v")
    def run() = Profile.approxQuantilesPerGroup(df, "src", "v", Seq(0.5, 0.9))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(run() == run())
  }

  test("sampleQuantilesPerGroup: near truth on uniform data, monotone, " +
      "deterministic") {
    // uniform 0..9999 with unique row keys; 25% deterministic sample →
    // rank error ~ 1/√2500 ⇒ estimates within a few hundred of truth
    val df = (0 until 10000).map(i => ("g", i.toLong, i.toLong))
      .toDF("src", "rid", "v")
    def run() = Profile.sampleQuantilesPerGroup(df, "src", "v", "rid",
      Seq(50, 90, 99), samplePerMyriad = 2500).collect()
      .map(r => r.getAs[Int]("prob_pct") -> r.getAs[Long]("q_sample")).toMap
    val got = run()
    assert(math.abs(got(50) - 5000L) <= 300L)
    assert(math.abs(got(90) - 9000L) <= 300L)
    assert(math.abs(got(99) - 9900L) <= 300L)
    assert(got(50) <= got(90) && got(90) <= got(99))
    assert(run() == got) // hash-deterministic sample: no RNG state
  }

  test("sampleQuantilesPerGroup at full rate equals the exact empirical " +
      "lower quantile") {
    // samplePerMyriad = 10000 keeps every row, so the estimate must be
    // EXACTLY the smallest value reaching rank ceil(p·n)
    val vals = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L, 5L, 3L)
    val df = vals.zipWithIndex.map { case (v, i) => ("g", i.toLong, v) }
      .toDF("src", "rid", "v")
    val got = Profile.sampleQuantilesPerGroup(df, "src", "v", "rid",
      Seq(50, 90), samplePerMyriad = 10000).collect()
      .map(r => r.getAs[Int]("prob_pct") -> r.getAs[Long]("q_sample")).toMap
    val sorted = vals.sorted // rank ceil(0.5·10)=5 → 5th smallest
    assert(got(50) == sorted(4))
    assert(got(90) == sorted(8))
  }

  test("histQuantilesPerGroup: bin lower bound within binWidth of truth") {
    // uniform 0..9999, binWidth 100: true p50 = 4999 (0-indexed rank
    // 5000 → value 4999), estimate = lower bound of the bin holding
    // rank ceil(p·n) → 4900 ≤ est ≤ 4999
    val df = (0 until 10000).map(i => ("g", i.toLong)).toDF("src", "v")
    val got = Profile.histQuantilesPerGroup(df, "src", "v",
      Seq(50, 90, 99), binWidth = 100L).collect()
      .map(r => r.getAs[Int]("prob_pct") -> r.getAs[Long]("q_hist")).toMap
    assert(got(50) == 4900L)   // rank 5000 sits in bin [4900,5000)
    assert(got(90) == 8900L)
    assert(got(99) == 9800L)   // rank 9900 → value 9899 → bin 98
  }

  test("histQuantileSketch merge of shards equals full-corpus sketch") {
    import org.apache.spark.sql.functions.{col, sum => ssum}
    val rows = (0 until 3000).map(i => (s"s${i % 2}", (i * 13 % 500).toLong))
    val full = rows.toDF("src", "v")
    val (aRows, bRows) = rows.splitAt(1100)
    val merged = Profile.histQuantileSketch(aRows.toDF("src", "v"), "src", "v", 50L)
      .unionByName(Profile.histQuantileSketch(bRows.toDF("src", "v"), "src", "v", 50L))
      .groupBy("src", "bin").agg(ssum("cnt").as("cnt"))
    val fullSketch = Profile.histQuantileSketch(full, "src", "v", 50L)
    def toSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(toSet(merged) == toSet(fullSketch))
    // and the estimates off the merged sketch match the one-pass path
    val estMerged = Profile.histQuantilesFromSketch(merged, "src", Seq(50, 99), 50L)
    val estFull = Profile.histQuantilesPerGroup(full, "src", "v", Seq(50, 99), 50L)
    assert(toSet(estMerged.select(col("src"), col("prob_pct").cast("long"),
        col("q_hist"))) ==
      toSet(estFull.select(col("src"), col("prob_pct").cast("long"),
        col("q_hist"))))
  }

  test("kmvSketchPerGroup: exact branch below k, estimate within 30%, merge==full") {
    // group "small" has 5 distinct values (< k=16 → exact count 5);
    // group "big" has 400 (> k → estimator branch)
    val rows = (1 to 5).map(i => ("small", s"u$i")) ++
      (1 to 1200).map(i => ("big", s"v${i % 400}"))
    val df = rows.toDF("g", "u")
    val sk = Profile.kmvSketchPerGroup(df, "g", "u", k = 16)
    val est = Profile.kmvEstimatePerGroup(sk, "g", "adc", k = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("small") == 5L)
    assert(math.abs(est("big") - 400L) <= 120L)   // KMV rel-error ~1/√k
    // merge of shard sketches == full sketch (min-k of a union, per group)
    val (a, b) = rows.splitAt(700)
    val merged = Profile.kmvSketchPerGroup(a.toDF("g", "u"), "g", "u", 16)
      .unionByName(Profile.kmvSketchPerGroup(b.toDF("g", "u"), "g", "u", 16))
      .distinct()
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    val recut = merged.withColumn("__rn",
        row_number().over(Window.partitionBy("g").orderBy("h")))
      .filter($"__rn" <= 16).select("g", "h")
    def toSet(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(toSet(recut) == toSet(sk))
  }

  test("psiDrift: zero on identical snapshots, reference value on shift") {
    // reference replay of the exact expression tree
    def refPsi(cur: Map[Long, Long], pri: Map[Long, Long]): Long = {
      val bins = (cur.keySet ++ pri.keySet).toSeq
      val (nC, nP, b) = (cur.values.sum, pri.values.sum, bins.size)
      bins.map { bin =>
        val p = (cur.getOrElse(bin, 0L) + 1).toDouble / (nC + b).toDouble
        val q = (pri.getOrElse(bin, 0L) + 1).toDouble / (nP + b).toDouble
        math.floor(1e6 * (p - q) * math.log(p / q)).toLong
      }.sum
    }
    // identical → every bin has p == q → psi exactly 0, no flag
    val same = (0 until 100).map(i => ("g", (i % 7) * 10L)).toDF("src", "v")
    val zero = Profile.psiDrift(same, same, "src", "v", binWidth = 10L)
      .collect()(0)
    assert(zero.getAs[Long]("psi_micro") == 0L &&
      zero.getAs[Int]("drift_flag") == 0)

    // shifted distribution incl. a bin present on one side only
    val cur = Seq.fill(8)(("g", 5L)) ++ Seq.fill(2)(("g", 15L))
    val pri = Seq.fill(2)(("g", 5L)) ++ Seq.fill(6)(("g", 15L)) ++
      Seq.fill(2)(("g", 25L))
    val got = Profile.psiDrift(cur.toDF("src", "v"), pri.toDF("src", "v"),
      "src", "v", binWidth = 10L).collect()(0)
    val want = refPsi(Map(0L -> 8L, 1L -> 2L),
      Map(0L -> 2L, 1L -> 6L, 2L -> 2L))
    assert(got.getAs[Long]("psi_micro") == want)
    assert(got.getAs[Long]("n_bins") == 3L)
    assert(got.getAs[Int]("drift_flag") == (if (want >= 200000L) 1 else 0))
  }
}
