package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Sampling, TextAnalysis}

/** Training-data prep invariants: hash-deterministic sampling/mixing must
  * be exactly reproducible (same input → same rows, run to run), rates
  * must land near their targets, and sharding must be a permutation. */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")

  test("stratifiedSample: deterministic, rate-accurate, filter-only plan") {
    val key = $"doc_id".cast("string")
    def run() = Sampling.stratifiedSample(docs.select("doc_id", "source"),
      key, $"source", Map("src0" -> 10000, "src1" -> 0), 5000)
    val a = run().as[(Long, String)].collect().toSet
    assert(a == run().as[(Long, String)].collect().toSet)
    val bySrc = run().groupBy("source").count().as[(String, Long)].collect().toMap
    val total = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc("src0") == total("src0"))            // rate 1.0 keeps all
    assert(!bySrc.contains("src1"))                   // rate 0 drops all
    val restKept = bySrc.collect { case (s, n) if s != "src0" && s != "src1" => n }.sum
    val restTotal = total.collect { case (s, n) if s != "src0" && s != "src1" => n }.sum
    assert(math.abs(restKept.toDouble / restTotal - 0.5) < 0.15)
    // pure filter: no exchange in the plan
    val plan = run().queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("weightedSample: endpoints keep all/none, rate tracks the weight") {
    val key = $"doc_id".cast("string")
    val n = docs.count()
    assert(Sampling.weightedSample(docs, key, lit(10000)).count() == n)
    assert(Sampling.weightedSample(docs, key, lit(0)).count() == 0)
    val kept = Sampling.weightedSample(docs, key, lit(3000)).count()
    assert(math.abs(kept.toDouble / n - 0.3) < 0.15)
    // deterministic: same rows both runs
    val a = Sampling.weightedSample(docs, key, lit(3000))
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.weightedSample(docs, key, lit(3000))
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
  }

  test("decontaminateSplit: exactly the train rows near-dupping a held-out row flip") {
    val df = Seq(
      (1L, "test"), (2L, "val"),
      (3L, "train"), (4L, "train"), (5L, "train"), (6L, "train")
    ).toDF("doc_id", "split")
    val pairs = Seq(
      (1L, 3L),  // test↔train → 3 contaminated
      (4L, 5L),  // train↔train → both stay
      (6L, 2L)   // train↔val → 6 contaminated
    ).toDF("i", "j")
    val got = Sampling.decontaminateSplit(df, $"doc_id", pairs, "i", "j")
      .as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "test", 2L -> "val",
      3L -> "train_contaminated", 4L -> "train", 5L -> "train",
      6L -> "train_contaminated"))
  }

  test("mixEpochs: per-stratum copy counts match the weight exactly per row") {
    val mixed = Sampling.mixEpochs(docs.select("doc_id", "source"),
      $"doc_id".cast("string"), $"source", Map("src0" -> 2.5, "src1" -> 0.25), 1.0)
    val copies = mixed.groupBy("doc_id", "source").count()
    // every row's copy count is floor(w) or floor(w)+1
    assert(copies.filter($"source" === "src0" && ($"count" < 2 || $"count" > 3)).count() == 0)
    assert(copies.filter($"source" === "src1" && $"count" =!= 1).count() == 0)
    assert(copies.filter($"source" =!= "src0" && $"source" =!= "src1" && $"count" =!= 1).count() == 0)
    // epochs are contiguous 1..n
    val bad = mixed.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n"), max("epoch").as("mx"), min("epoch").as("mn"))
      .filter($"mx" =!= $"n" || $"mn" =!= 1)
    assert(bad.count() == 0)
    // aggregate replication of src0 ≈ 2.5× (hash-deterministic Bernoulli)
    val n0 = docs.filter($"source" === "src0").count().toDouble
    val m0 = mixed.filter($"source" === "src0").count().toDouble
    assert(m0 / n0 >= 2.0 && m0 / n0 <= 3.0)
  }

  test("shuffleShards: a reproducible permutation in nShards shards") {
    def run() = Sampling.shuffleShards(docs.select("doc_id"),
      $"doc_id".cast("string"), 4)
    val a = run().as[(Long, Long, Long)].collect()
    assert(a.toSet == run().as[(Long, Long, Long)].collect().toSet)
    assert(a.length == docs.count())                  // no row lost or duplicated
    assert(a.map(_._2).distinct.sorted.toSeq.forall(s => s >= 0 && s < 4))
    // positions within each shard are 1..count(shard)
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
  }

  test("shard family plans: one hash exchange on the shard key, no range sort") {
    val shards = Sampling.shuffleShards(docs.select("doc_id"),
      $"doc_id".cast("string"), 4)
    val packed = Sampling.packSequences(
      docs.select($"doc_id", lit(10L).as("n_tokens")),
      $"doc_id".cast("string"), $"n_tokens", 2048, 4)
    for (df <- Seq(shards, packed)) {
      val plan = df.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges == 1, s"expected exactly one hash exchange:\n$plan")
      assert(!plan.contains("rangepartitioning"), s"global sort crept in:\n$plan")
    }
  }

  test("md5NgramBuckets kernel == the SQL zip_with formulation it replaced") {
    // the kernel must bucket bit-identically to the HOF spelling the
    // oracle replays: trim is SPACE-only (tabs/newlines survive into
    // split, producing the leading "" token), bigrams join on one space,
    // int bucket = first 3 md5 hex chars. Edge rows target exactly those
    // seams; the sf0.001 corpus covers real text.
    val edges = Seq("", " ", "  a  b ", "\ta b", "a\nb", "one",
      "a b c d", "é 中文 emoji😀 x").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    for (df <- Seq(edges, docs.select("doc_id", "text"))) {
      val toks = split(trim(col("text")), "\\s+")
      val sql = df.select(col("doc_id"), explode(concat(toks,
          zip_with(
            slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
            slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
            (a, b) => concat(a, lit(" "), b)))).as("tok"))
        .select(col("doc_id"),
          conv(substring(md5(col("tok")), 1, 3), 16, 10).cast("int").as("bkt"))
      val kernel = df.select(col("doc_id"),
        explode(graft.expr.sketchFunctions.md5_ngram_buckets(col("text")))
          .as("bkt"))
      val l = sql.groupBy("doc_id", "bkt").count()
        .as[(Long, Int, Long)].collect().toSet
      val r = kernel.groupBy("doc_id", "bkt").count()
        .as[(Long, Int, Long)].collect().toSet
      assert(l == r)
    }
  }

  test("dsirWeights: target-like docs outrank dissimilar docs; resample keeps exactly k") {
    // two disjoint vocabularies: target docs speak "alpha", the rest
    // "omega"; a raw doc written in alpha-speak must outweigh every
    // omega doc (its n-gram buckets carry the target's probability mass)
    val alpha = "solar panel grid inverter battery storage watt"
    val omega = "gothic cathedral nave spire buttress transept choir"
    val rows = (0L until 10L).map(i => (i, alpha, true)) ++   // target slice
      Seq((100L, alpha + " efficiency", false)) ++            // alpha-like raw
      (200L until 210L).map(i => (i, omega, false))           // omega raw
    val df = rows.toDF("doc_id", "text", "is_target")
    val w = Sampling.dsirWeights(df, $"doc_id", $"text", $"is_target")
      .as[(Long, Long)].collect().toMap
    assert(w.size == rows.size)
    val alphaW = w(100L)
    (200L until 210L).foreach { i =>
      assert(alphaW > w(i), s"alpha-like doc $alphaW !> omega doc ${w(i)}")
    }
    // determinism: same input, same weights
    val w2 = Sampling.dsirWeights(df, $"doc_id", $"text", $"is_target")
      .as[(Long, Long)].collect().toMap
    assert(w == w2)
    // resample keeps exactly k, flags every row, and prefers high keys
    val weighted = Sampling.dsirWeights(df, $"doc_id", $"text", $"is_target")
    val kept = Sampling.dsirResample(weighted, "id", "w_milli", k = 5)
      .select("id", "key_milli", "kept").as[(Long, Long, Boolean)].collect()
    assert(kept.length == rows.size)
    assert(kept.count(_._3) == 5)
    val minKept = kept.filter(_._3).map(_._2).min
    val maxDropped = kept.filterNot(_._3).map(_._2).max
    assert(minKept >= maxDropped)
  }

  test("dsirResample: empty input keeps nothing instead of null-flagging") {
    val empty = Seq.empty[(Long, Long)].toDF("id", "w_milli")
    val out = Sampling.dsirResample(empty, "id", "w_milli", k = 5)
    assert(out.count() == 0)
    // and a single row is kept when k >= n
    val one = Seq((7L, 100L)).toDF("id", "w_milli")
    val kept = Sampling.dsirResample(one, "id", "w_milli", k = 5)
      .select("kept").as[Boolean].collect()
    assert(kept.toSeq == Seq(true))
  }

  test("repetitionStats: hand-computed bigram fractions") {
    val df = Seq(
      (1L, "a b a b a"),          // bigrams: ab,ba,ab,ba → top 2/4, dup 4/4
      (2L, "w x y z"),            // all distinct → top 1/3, dup 0
      (3L, "solo")                // no bigram → absent from output
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(df, "doc_id", "text", 2)
      .select("doc_id", "n_grams", "n_distinct", "top_cnt", "dup_cnt")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (id, a, b, c, d) => id -> ((a, b, c, d)) }.toMap
    assert(out(1L) == ((4L, 2L, 2L, 4L)))
    assert(out(2L) == ((3L, 3L, 1L, 0L)))
    assert(!out.contains(3L))
  }

  test("temperatureWeights: sqrt-balanced shares, hand-computed") {
    import graft.ops.Sampling
    // strata sized 1, 4, 16 tokens → sqrt 1:2:4 → milli 142/285/571
    val df = Seq(("a", 1L), ("b", 4L), ("c", 16L)).toDF("src", "n")
    val got = Sampling.temperatureWeights(df, col("src"), col("n"))
      .collect().map(r => r.getAs[String]("stratum") ->
        ((r.getAs[Long]("n_units"), r.getAs[Long]("weight_milli")))).toMap
    assert(got == Map("a" -> ((1L, 142L)), "b" -> ((4L, 285L)),
      "c" -> ((16L, 571L))))
    // flattening property: c's raw share is 16/21 ≈ 762 milli but its
    // temperature share is 571 — big strata shrink, small ones grow
    assert(got("c")._2 < 762L && got("a")._2 > 1000L / 21L)
  }

  test("lengthBucketedBatches: smallest rung holds, batches bounded, deterministic") {
    import graft.ops.Sampling
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", size(split(trim($"text"), "\\s+")).cast("long").as("n_tokens"))
    val out = Sampling.lengthBucketedBatches(docs, $"doc_id".cast("string"),
      $"n_tokens", batchSize = 8, nShards = 4).cache()
    try {
      // every doc sits in the smallest rung that holds it (or the top rung)
      val ladder = Seq(16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192)
      out.collect().foreach { r =>
        val (n, cap) = (r.getAs[Long]("n_tokens"), r.getAs[Int]("bucket_cap"))
        val expect = ladder.find(n <= _).getOrElse(8192)
        assert(cap == expect, s"n=$n cap=$cap")
        assert(r.getAs[Long]("tokens_used") == math.min(n, cap.toLong))
      }
      // no batch exceeds batchSize; only the LAST batch per (bucket, shard)
      // may be short
      val sizes = out.groupBy("bucket_cap", "shard", "batch_no")
        .count().collect()
        .map(r => ((r.getInt(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      assert(sizes.forall(_._2._2 <= 8))
      sizes.groupBy(_._1).foreach { case (_, bs) =>
        val maxBatch = bs.map(_._2._1).max
        bs.filter(_._2._1 < maxBatch).foreach { case (_, (_, n)) =>
          assert(n == 8, s"non-final batch short: $bs") }
      }
      // pure function of content: same assignment on a different layout
      val again = Sampling.lengthBucketedBatches(
        docs.repartition(7), $"doc_id".cast("string"), $"n_tokens", 8, 4)
      assert(again.collect().map(_.toSeq).toSet == out.collect().map(_.toSeq).toSet)
    } finally out.unpersist()
  }

  test("reweightToTarget: inverse-share weights, clamp flagged") {
    val docs = (Seq.fill(8)("a") ++ Seq.fill(2)("b")).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "source")
    val targets = Seq(("a", 500L), ("b", 500L)).toDF("source", "target_milli")
    // N=10: w_a = 500*10/8 = 625, w_b = 500*10/2 = 2500; no clamp
    val wide = Sampling.reweightToTarget(docs, "source", targets,
        "target_milli", minMilli = 100L, maxMilli = 3000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    assert(wide("a") == ((8L, 800L, 625L, 0)))
    assert(wide("b") == ((2L, 200L, 2500L, 0)))
    // tight cap: b clamps to 1000 and is flagged
    val tight = Sampling.reweightToTarget(docs, "source", targets,
        "target_milli", minMilli = 100L, maxMilli = 1000L)
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getInt(4))).toMap
    assert(tight("a") == ((625L, 0)))
    assert(tight("b") == ((1000L, 1)))
  }

  test("reweightToTarget surfaces strata missing a target row as NULL " +
      "weight instead of dropping them") {
    val docs = (Seq.fill(6)("a") ++ Seq.fill(4)("zzz")).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "source")
    val targets = Seq(("a", 500L)).toDF("source", "target_milli") // no zzz
    val got = Sampling.reweightToTarget(docs, "source", targets,
        "target_milli", minMilli = 100L, maxMilli = 3000L).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)), Option(r.get(4))))
      .toMap
    assert(got.keySet == Set("a", "zzz")) // zzz present, not dropped
    assert(got("a")._3.contains(833L))    // 500·10//6
    assert(got("zzz") == ((4L, 400L, None, None)))
  }
}
