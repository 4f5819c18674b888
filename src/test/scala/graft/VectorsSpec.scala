package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Vectors

class VectorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cosine via HOFs matches closed form") {
    val df = Seq((Array(1.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    val c = df.select(Vectors.cosine($"a", $"b").as("c")).collect()(0).getDouble(0)
    assert(math.abs(c - math.sqrt(0.5)) < 1e-12)
  }

  test("brute-force top-k ranks by cosine with id tie-break") {
    val corpus = Seq(
      (10L, Array(1.0f, 0.0f)), (11L, Array(0.9f, 0.1f)),
      (12L, Array(0.0f, 1.0f)), (13L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Vectors.annBruteForceTopK(q, corpus, "vec_id", "vec_id",
      "embedding", "embedding", k = 3)
      .orderBy($"rk").as[(Long, Long, Int)].collect().toList
    assert(got.map(_._2) == List(10L, 11L, 12L))
  }

  test("LSH top-k returns only same-bucket candidates, correctly ranked") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val planes = Vectors.hyperplanes(4, 64)
    val withBucket = e.select($"vec_id",
      Vectors.hyperplaneBuckets($"embedding", planes).as("bucket"))
      .as[(Long, Int)].collect().toMap
    val got = Vectors.annLshTopK(e.filter($"vec_id" < 4), e,
      "vec_id", "vec_id", "embedding", "embedding", k = 3)
      .as[(Long, Long, Int)].collect()
    assert(got.nonEmpty)
    got.foreach { case (qid, cid, _) =>
      assert(withBucket(qid) == withBucket(cid), s"pair ($qid,$cid) crosses buckets")
    }
    // ranks within each query are 1..n without gaps
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toList == (1 to rows.length).toList)
    }
  }

  test("PQ: deterministic codebook, valid codes, ADC recall vs brute force") {
    import graft.ops.Quantize
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")

    val idx = Quantize.pqFit(e, "vec_id", "embedding")
    val idx2 = Quantize.pqFit(e, "vec_id", "embedding")
    assert(idx.codebook.toSeq == idx2.codebook.toSeq) // byte-identical refit
    assert(idx.m * idx.subDim == 64 && idx.codebook.length == idx.m * idx.k * idx.subDim)

    val coded = Quantize.pqEncode(e, "vec_id", "embedding", idx)
    val rows = coded.as[(Long, Seq[Int], Double)].collect()
    assert(rows.length == e.count())
    rows.foreach { case (_, codes, rn2) =>
      assert(codes.length == idx.m && codes.forall(c => c >= 0 && c < idx.k))
      assert(rn2 > 0.0)
    }

    val q = e.filter($"vec_id" < 8)
    val exact = Vectors.annBruteForceTopK(q, e, "vec_id", "vec_id",
      "embedding", "embedding", k = 5)
    // flat ADC on 64-dim NOISE is the worst case for a coarse code —
    // only sanity-check it beats random (random recall@5 on n≈200 ≈ 0.025)
    val flat = Quantize.annPqTopK(q, coded, idx, "vec_id", "vec_id",
      "embedding", k = 5)
    val flatRecall = Vectors.recallAtK(flat, exact, "qid", "cid", k = 5)
      .agg(avg($"recall")).collect()(0).getDouble(0)
    assert(flatRecall >= 0.1, s"flat ADC mean recall@5 $flatRecall")
    // the deployed shape: ADC proposes, exact re-rank on the candidates
    val refined = Quantize.annPqRefineTopK(q, coded, e, idx,
      "vec_id", "vec_id", "embedding", "embedding", k = 5, rerank = 50)
    val refRecall = Vectors.recallAtK(refined, exact, "qid", "cid", k = 5)
      .agg(avg($"recall")).collect()(0).getDouble(0)
    assert(refRecall >= 0.6, s"refined mean recall@5 $refRecall")
    assert(refRecall >= flatRecall)
  }

  test("IVF-PQ: recall within probed cells, nProbe=nCells ≈ refined PQ, deterministic") {
    import graft.ops.Quantize
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val pq = Quantize.pqFit(e, "vec_id", "embedding")
    val ivf = Vectors.ivfBuild(e, "vec_id", "embedding", nCells = 8)
    val q = e.filter($"vec_id" < 8)
    val exact = Vectors.annBruteForceTopK(q, e, "vec_id", "vec_id",
      "embedding", "embedding", k = 5)

    val got = Quantize.annIvfPqTopK(q, ivf, pq, "vec_id", "embedding",
      k = 5, nProbe = 4, rerank = 30)
    val ranks = got.groupBy("qid").agg(collect_list($"rk")).collect()
    assert(ranks.length == 8)
    ranks.foreach(r => assert(
      r.getSeq[Int](1).sorted == (1 to 5), r.toString)) // contiguous ranks
    val recall = Vectors.recallAtK(got, exact, "qid", "cid", k = 5)
      .agg(avg($"recall")).collect()(0).getDouble(0)
    assert(recall >= 0.3, s"IVF-PQ mean recall@5 $recall (4/8 cells probed)")

    // probing every cell = PQ-refine over the whole corpus: recall must
    // be at least the partial-probe recall and match the flat refine path
    val full = Quantize.annIvfPqTopK(q, ivf, pq, "vec_id", "embedding",
      k = 5, nProbe = 8, rerank = 30)
    val fullRecall = Vectors.recallAtK(full, exact, "qid", "cid", k = 5)
      .agg(avg($"recall")).collect()(0).getDouble(0)
    assert(fullRecall >= recall, s"full-probe $fullRecall < partial $recall")

    val again = Quantize.annIvfPqTopK(q, ivf, pq, "vec_id", "embedding",
      k = 5, nProbe = 4, rerank = 30)
      .orderBy("qid", "rk").collect().map(_.toString)
    assert(again.toSeq == got.orderBy("qid", "rk").collect().map(_.toString).toSeq)
  }

  test("recall@k: exact scores itself at 1, approx matches the set overlap") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.filter($"vec_id" < 4)
    val exact = Vectors.annBruteForceTopK(q, e, "vec_id", "vec_id",
      "embedding", "embedding", k = 5)
    val approx = Vectors.annLshTopK(q, e, "vec_id", "vec_id",
      "embedding", "embedding", k = 5)

    val self = Vectors.recallAtK(exact, exact, "qid", "cid", k = 5)
      .as[(Long, Long, Double)].collect()
    assert(self.length == 4)
    self.foreach { case (_, n, r) => assert(n == 5L && r == 1.0) }

    val exSets = exact.as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val apSets = approx.as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = Vectors.recallAtK(approx, exact, "qid", "cid", k = 5)
      .as[(Long, Long, Double)].collect().toList
    assert(got.map(_._1).toSet == exSets.keySet)
    got.foreach { case (qid, n, r) =>
      val want = (exSets(qid) & apSets.getOrElse(qid, Set.empty)).size
      assert(n == want.toLong && r == want / 5.0, s"query $qid")
    }
  }

  test("IVF top-k: recall vs brute force, ranks contiguous, deterministic") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.filter($"vec_id" < 4)
    val exact = Vectors.annBruteForceTopK(q, e, "vec_id", "vec_id",
      "embedding", "embedding", k = 5).as[(Long, Long, Int)].collect().toSet
    val ivf = Vectors.annIvfTopK(q, e, "vec_id", "vec_id",
      "embedding", "embedding", k = 5, nCells = 8, nProbe = 4)
      .as[(Long, Long, Int)].collect()
    // ranks are 1..n per query without gaps
    ivf.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toList == (1 to rows.length).toList)
    }
    // probing half the cells recovers a reasonable share of the true top-5
    val recall = ivf.map(r => (r._1, r._2)).toSet
      .intersect(exact.map(r => (r._1, r._2)).toSet).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall=$recall")
    // determinism: same seed → same result
    val again = Vectors.annIvfTopK(q, e, "vec_id", "vec_id",
      "embedding", "embedding", k = 5, nCells = 8, nProbe = 4)
      .as[(Long, Long, Int)].collect()
    assert(ivf.toSet == again.toSet)
  }

  test("quantized ANN: int8 reconstruction preserves most of the true top-k") {
    import graft.ops.Quantize
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val exact = Vectors.annBruteForceTopK(e.filter($"vec_id" < 4), e,
      "vec_id", "vec_id", "embedding", "embedding", k = 5)
      .as[(Long, Long, Int)].collect().toSet
    val rec = Quantize.dequantize(e, "vec_id", "embedding")
    val quant = Vectors.annBruteForceTopK(rec.filter($"vec_id" < 4), rec,
      "vec_id", "vec_id", "recon", "recon", k = 5)
      .as[(Long, Long, Int)].collect().toSet
    val recall = quant.map(r => (r._1, r._2))
      .intersect(exact.map(r => (r._1, r._2))).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall=$recall")  // int8 on 64 dims: near-lossless
  }

  test("IVF prebuilt index: build once, query many — matches the convenience path") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = Vectors.ivfBuild(e, "vec_id", "embedding", nCells = 8)
    val q = e.filter($"vec_id" < 4)
    val viaIndex = Vectors.annIvfTopK(q, idx, "vec_id", "embedding",
      k = 5, nProbe = 4, pruneFiles = false).as[(Long, Long, Int)].collect().toSet
    val convenience = Vectors.annIvfTopK(q, e, "vec_id", "vec_id",
      "embedding", "embedding", k = 5, nCells = 8, nProbe = 4)
      .as[(Long, Long, Int)].collect().toSet
    assert(viaIndex == convenience)
    // second batch against the SAME index — no refit
    val q2 = e.filter($"vec_id" >= 4 && $"vec_id" < 6)
    assert(Vectors.annIvfTopK(q2, idx, "vec_id", "embedding",
      k = 3, nProbe = 4, pruneFiles = false).count() > 0)
  }

  test("IVF save/load round-trip: cell-partitioned layout, identical results") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = Vectors.ivfBuild(e, "vec_id", "embedding", nCells = 8)
    val q = e.filter($"vec_id" < 4)
    val direct = Vectors.annIvfTopK(q, idx, "vec_id", "embedding",
      k = 5, nProbe = 4, pruneFiles = false).as[(Long, Long, Int)].collect().toSet

    val path = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    Vectors.ivfSave(idx, path)
    // the on-disk assignment is physically partitioned by cell
    val cellDirs = new java.io.File(s"$path/assigned").listFiles()
      .filter(_.getName.startsWith("cell="))
    assert(cellDirs.length > 1, "assigned corpus should be cell-partitioned")
    val loaded = Vectors.ivfLoad(spark, path)
    assert(loaded.centroids.map(_._2).toList == idx.centroids.map(_._2).toList)
    val viaDisk = Vectors.annIvfTopK(q, loaded, "vec_id", "embedding",
      k = 5, nProbe = 4, pruneFiles = false).as[(Long, Long, Int)].collect().toSet
    assert(viaDisk == direct)

    // pruneFiles turns the probe set into a static partition filter:
    // same results, and the scan's PartitionFilters carries the cell
    // IN-list so non-probed cell directories are never read
    val pruned = Vectors.annIvfTopK(q, loaded, "vec_id", "embedding",
      k = 5, nProbe = 2, pruneFiles = true)
    val unpruned = Vectors.annIvfTopK(q, loaded, "vec_id", "embedding",
      k = 5, nProbe = 2, pruneFiles = false)
    assert(pruned.as[(Long, Long, Int)].collect().toSet ==
      unpruned.as[(Long, Long, Int)].collect().toSet)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined, plan)
  }

  test("ivfIngest: batch joins the index without refit, answers match the full build") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val corpus = e.filter($"vec_id" % 10 =!= 0)
    val batch = e.filter($"vec_id" % 10 === 0)
    val idx = Vectors.ivfBuild(corpus, "vec_id", "embedding", nCells = 8)
    val merged = Vectors.ivfIngest(idx, batch, "vec_id", "embedding")

    // centroids untouched, every row present exactly once
    assert(merged.centroids.map(_._2).toList == idx.centroids.map(_._2).toList)
    assert(merged.assigned.count() == e.count())

    // ingested rows sit in their nearest-Euclidean cell (recomputed here
    // by brute force against the driver-side centroid table)
    val got = merged.assigned.join(batch.select($"vec_id".as("cid")), "cid")
      .select($"cid", $"cell", $"cv").collect()
    got.foreach { r =>
      val v = r.getSeq[Float](2)
      val best = idx.centroids.map { case (c, i) =>
        (c.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum, i)
      }.minBy(_._1)._2
      assert(r.getInt(1) == best, s"cid=${r.getLong(0)}")
    }

    // nProbe = nCells removes the approximation, so the merged index must
    // answer exactly what brute force over the full corpus answers
    val q = e.filter($"vec_id" < 4)
    val viaMerged = Vectors.annIvfTopK(q, merged, "vec_id", "embedding",
      k = 5, nProbe = 8, pruneFiles = false).as[(Long, Long, Int)].collect().toSet
    val brute = Vectors.annBruteForceTopK(q, e, "vec_id", "vec_id",
      "embedding", "embedding", k = 5).as[(Long, Long, Int)].collect().toSet
    assert(viaMerged == brute)
  }

  test("multi-probe LSH: superset of single-probe, recall climbs toward exact") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter($"vec_id" < 8)
    def hits(nProbe: Int) = Vectors.annLshTopK(q, e, "vec_id", "vec_id",
        "embedding", "embedding", k = 5, nPlanes = 4, nProbe = nProbe)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2)).toSet
    val exact = Vectors.annBruteForceTopK(q, e, "vec_id", "vec_id",
        "embedding", "embedding", k = 5)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2)).toSet
    val one = hits(1); val three = hits(3); val five = hits(5)
    def recall(s: Set[(Long, Long)]) = s.intersect(exact).size.toDouble / exact.size
    // more probes → more candidates → monotonically better recall
    assert(recall(three) >= recall(one))
    assert(recall(five) >= recall(three))
    assert(recall(five) > recall(one), s"multi-probe should add candidates: " +
      s"r1=${recall(one)} r3=${recall(three)} r5=${recall(five)}")
  }

  test("hyperplanes are deterministic under the fixed seed") {
    assert(Vectors.hyperplanes(3, 8) == Vectors.hyperplanes(3, 8))
  }

  test("pcaProject: deterministic, leading-variance first, preserves dominant axis") {
    // data stretched along a known axis: x spread 100×, y spread 1×, z≈0 —
    // pc1 must recover the x axis (up to the canonical sign, positive lead)
    val rnd = new scala.util.Random(5)
    val rows = (0L until 200L).map { i =>
      (i, Array((rnd.nextGaussian() * 100).toFloat,
        rnd.nextGaussian().toFloat, 0.01f * rnd.nextGaussian().toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = Vectors.pcaProject(df, "vec_id", "embedding", kDims = 2)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.length == 200)
    // pc1 carries the spread: its sample variance dwarfs pc2's
    def variance(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
    }
    val v1 = variance(out.map(_._2.toDouble))
    val v2 = variance(out.map(_._3.toDouble))
    assert(v1 > 100 * v2, s"pc1 var $v1 not >> pc2 var $v2")
    // pc1 ≈ ±x (milli): projection correlates almost perfectly with x
    val xs = rows.map(_._2(0).toDouble)
    val ps = out.map(_._2.toDouble / 1000.0)
    val corr = {
      val mx = xs.sum / xs.size; val mp = ps.sum / ps.size
      val cov = xs.zip(ps).map { case (a, b) => (a - mx) * (b - mp) }.sum
      cov / math.sqrt(xs.map(a => (a - mx) * (a - mx)).sum *
        ps.map(b => (b - mp) * (b - mp)).sum)
    }
    assert(math.abs(corr) > 0.999, s"pc1/x correlation $corr")
    // sign canon: the largest-|loading| coordinate is positive, so the
    // projection has POSITIVE correlation with x
    assert(corr > 0, s"sign canon should align pc1 with +x, corr=$corr")
    // deterministic across calls
    val out2 = Vectors.pcaProject(df, "vec_id", "embedding", kDims = 2)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == out2.toSeq)
  }
  test("nProbe = 0 degenerates to an empty result, not an exception") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = Vectors.ivfBuild(emb, "vec_id", "embedding", nCells = 4)
    val q = emb.filter($"vec_id" < 2)
    assert(Vectors.annIvfTopK(q, idx, "vec_id", "embedding",
      k = 3, nProbe = 0, pruneFiles = false).count() == 0)
  }

}
