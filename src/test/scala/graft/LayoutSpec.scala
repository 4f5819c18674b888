package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Morton-key layout: hand-computed interleaves and the dyadic-block
  * locality property that makes Z-order files skippable on both dims. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zorderKey2 interleaves bits (x even positions, y odd)") {
    val df = Seq((3L, 1L), (5L, 6L), (0L, 0L), (255L, 0L)).toDF("x", "y")
    val got = df.select(Layout.zorderKey2($"x", $"y", bits = 8))
      .as[Long].collect().toList
    // morton(3,1)=0b0111=7; morton(5,6)=0b111001=57; x-only fills evens
    assert(got == List(7L, 57L, 0L, 0x5555L))
  }

  test("zorderKeyN: 2-D agrees with zorderKey2; 3-D interleaves round-robin") {
    val df = Seq((3L, 1L, 5L)).toDF("x", "y", "z")
    val two = df.select(
      Layout.zorderKeyN(Seq($"x", $"y"), bits = 8) ===
        Layout.zorderKey2($"x", $"y", bits = 8)).as[Boolean].collect()
    assert(two.forall(identity))
    // 3-D, bits=2: x=3(11) → pos 0,3; y=1(01) → pos 1; z=1(01) → pos 2
    val three = Seq((3L, 1L, 1L)).toDF("x", "y", "z")
      .select(Layout.zorderKeyN(Seq($"x", $"y", $"z"), bits = 2))
      .as[Long].collect().head
    assert(three == ((1L << 0) | (1L << 3) | (1L << 1) | (1L << 2)))
  }

  test("16×16 grid in Morton order cuts into exact 4×4 blocks") {
    // 256 grid cells sorted by zkey, chunked into 16 files of 16 rows:
    // every file is a dyadic 4×4 quadrant — span 3 on BOTH dims. A
    // single-dim sort would leave the other dim spanning the full 15.
    val grid = (for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val ranked = grid
      .withColumn("zkey", Layout.zorderKey2($"x", $"y", bits = 4))
      .withColumn("file_id",
        floor(row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("zkey")) .minus(1) / 16))
    val spans = ranked.groupBy("file_id")
      .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"))
      .collect()
    assert(spans.length == 16)
    assert(spans.forall(r => r.getAs[Long]("xs") == 3L && r.getAs[Long]("ys") == 3L))
  }

  test("zorderWrite clusters: every partition's hypercube is bounded") {
    val grid = (for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val clustered = Layout.zorderWrite(grid, "x", "y", nFiles = 8, bits = 4)
    val spans = clustered
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(count(lit(1)).as("n"),
        (max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"))
      .collect()
    // range boundaries are sampled, so assert the qualitative contract:
    // no partition covers the full grid on both dims at once
    assert(spans.map(_.getAs[Long]("n")).sum == 256L)
    assert(spans.filter(_.getAs[Long]("n") > 1)
      .forall(r => r.getAs[Long]("xs") < 15L || r.getAs[Long]("ys") < 15L))
  }

  test("partitionedWrite prunes directories at plan time and one file per dir") {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_layout_spec_" +
      ProcessHandle.current().pid()
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "source", "n_chars", "lang")
    Layout.partitionedWrite(docs, root, Seq("lang"))

    val langs = docs.select("lang").distinct().count()
    val dirs = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("lang="))
    assert(dirs.length == langs)
    // one data file per partition directory (small-files contract)
    assert(dirs.forall(_.listFiles().count(_.getName.endsWith(".parquet")) == 1))

    val pruned = Layout.prunedRead(spark, root, col("lang").isin("en", "zh"))
    val scan = pruned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    // the filter reached the scan as a PartitionFilter and only the two
    // matching directories survive the planning-time listing
    assert(scan.partitionFilters.nonEmpty)
    assert(scan.selectedPartitions.partitionCount == 2)
    assert(pruned.count() ==
      docs.filter(col("lang").isin("en", "zh")).count())
  }

  test("backfillPartitions rewrites only the incoming partition, others byte-untouched") {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_layout_bf_" +
      ProcessHandle.current().pid()
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "source", "n_chars", "lang")
    Layout.partitionedWrite(docs, root, Seq("lang"))

    def dataFiles(lang: String): Map[String, Long] =
      new java.io.File(s"$root/lang=$lang").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    val othersBefore = docs.select("lang").distinct().collect()
      .map(_.getString(0)).filter(_ != "en").map(l => l -> dataFiles(l)).toMap

    // replay "en" only, with visibly different content (ids shifted)
    val redo = docs.filter(col("lang") === "en")
      .withColumn("doc_id", col("doc_id") + 1000000L)
    Layout.backfillPartitions(redo, root, Seq("lang"))

    // untouched partitions: literally the same files (name + mtime)
    othersBefore.foreach { case (l, before) =>
      assert(dataFiles(l) == before, s"partition lang=$l was rewritten")
    }
    // the replayed partition really was replaced, not appended
    val back = spark.read.parquet(root)
    assert(back.filter(col("lang") === "en" && col("doc_id") < 1000000L).count() == 0)
    assert(back.filter(col("lang") === "en").count() ==
      docs.filter(col("lang") === "en").count())
    // a static-mode overwrite would have truncated the others — row
    // counts outside "en" are unchanged
    assert(back.filter(col("lang") =!= "en").count() ==
      docs.filter(col("lang") =!= "en").count())
  }

  test("mergeSchema unifies snapshot generations; old rows null-fill added columns") {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_layout_ms_" +
      ProcessHandle.current().pid()
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // generation 1: the original contract; generation 2 adds a column
    // (the profile_schema_drift query's "added" verdict, seen read-side)
    docs.select("doc_id", "source").limit(20)
      .write.mode("overwrite").parquet(s"$root/gen=1")
    docs.select(col("doc_id"), col("source"),
        (col("n_chars") / 100).cast("int").as("quality"))
      .limit(20).write.mode("overwrite").parquet(s"$root/gen=2")

    val merged = spark.read.option("mergeSchema", "true").parquet(root)
    assert(merged.schema.fieldNames.toSet ==
      Set("doc_id", "source", "quality", "gen"))
    // old generation surfaces the new column as null, not as an error
    assert(merged.filter(col("gen") === 1 && col("quality").isNotNull).count() == 0)
    assert(merged.filter(col("gen") === 2 && col("quality").isNull).count() == 0)
    assert(merged.count() == 40)
  }

  test("globalNtile equals ntile over the total order (skewed keys, N<n edge)") {
    import org.apache.spark.sql.expressions.Window
    // skewed: key 7 holds half the rows, several singleton keys, and the
    // tie column deliberately interleaves across keys
    val rows = (0 until 500).map { i =>
      val k = if (i % 2 == 0) 7L else (i % 19).toLong
      (k, (i * 37 % 1000).toLong)
    }
    val df = rows.toDF("k", "tie")
      .groupBy("k", "tie").agg(count(lit(1))).select("k", "tie") // unique ties
    // force the DECOMPOSED path (a test frame is far below the byte
    // gate, which would fall back to the literal window and test nothing)
    spark.conf.set("spark.graft.globalNtileSingleTaskMaxBytes", "0")
    try {
      for (n <- Seq(1, 3, 32)) {
        val want = df.withColumn("b",
          ntile(n).over(Window.orderBy(col("k"), col("tie"))))
          .orderBy("k", "tie").select("b").as[Int].collect().toList
        val got = Layout.globalNtile(df, col("k"), col("tie"), n, "b")
          .orderBy("k", "tie").select("b").as[Int].collect().toList
        assert(got == want, s"n=$n")
      }
      // N < n: every row its own bucket, ids 1..N
      val tiny = Seq((1L, 1L), (1L, 2L), (2L, 1L)).toDF("k", "tie")
      val got = Layout.globalNtile(tiny, col("k"), col("tie"), 32, "b")
        .orderBy("k", "tie").select("b").as[Int].collect().toList
      assert(got == List(1, 2, 3))
    } finally spark.conf.unset("spark.graft.globalNtileSingleTaskMaxBytes")
    // default gate: a small frame takes the literal-window path and
    // agrees too
    val viaGate = Layout.globalNtile(df, col("k"), col("tie"), 7, "b")
      .orderBy("k", "tie").select("b").as[Int].collect().toList
    val wantGate = df.withColumn("b",
      ntile(7).over(Window.orderBy(col("k"), col("tie"))))
      .orderBy("k", "tie").select("b").as[Int].collect().toList
    assert(viaGate == wantGate)
  }

  test("compactionPlan: sorted next-fit bins, oversized file isolates") {
    // key k: sizes 900, 600, 500, 100 → sorted cumsum 900,1500,2000,2100
    //   target 1000: bins (cum-bytes)/1000 → 0, 0, 1, 2
    //   (900+600 overfills bin 0 — next-fit closes it at the boundary)
    // oversized 2500 in key j: (2500-2500)/1000 = bin 0, alone
    val files = Seq(
      ("k", "a", 900L), ("k", "b", 600L), ("k", "c", 500L), ("k", "d", 100L),
      ("j", "big", 2500L), ("j", "tiny", 10L)).toDF("src", "file", "bytes")
    val got = Layout.compactionPlan(files, "src", "file", "bytes", 1000L)
      .orderBy("src", "bin")
      .as[(String, Long, Long, Long)].collect().toList
    assert(got == List(
      ("j", 0L, 1L, 2500L), ("j", 2L, 1L, 10L),
      ("k", 0L, 2L, 1500L), ("k", 1L, 1L, 500L), ("k", 2L, 1L, 100L)))
  }
}
