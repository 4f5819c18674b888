package graft

import org.apache.spark.sql.SparkSession

/** Result-cardinality probe (r14 verdict ask #1): runs ONE named
  * SparkEntry query under the exact Bench session config + warmup and
  * prints its row count alongside the wall time —
  *
  *   {"query":…,"rows":N,"sec":…,"sf":…}
  *
  * The adjudication tool for output-bound scale steps: a query whose
  * measured time step at 10× data matches (or is dominated by) its
  * RESULT-SIZE step is throughput-healthy even when the raw time ratio
  * breaks the 15× contract line — f12_similarity_ratcliff at θ = 0.5
  * has a DuckDB-measured quadratic qualifying-pair count (BASELINE.md
  * round 10: 1.08M → 108M for sf0.1 → sf1), so its sf10 step must be
  * divided by the sf10 pair count before it means anything. Rows are
  * counted by the same `.count()` the bench times, so sec here is
  * protocol-comparable with a single fresh-JVM spot sample.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… tools/java_run.sh graft.RowProbe <query>
  */
object RowProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val query = args.headOption.getOrElse(
      sys.error("usage: RowProbe <query>"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Bench-identical warmup (codegen/JIT/page-cache parity), including
    // Bench's third step — the 3-edge connectedComponents run that JITs
    // the iterative-loop/checkpoint machinery — so a single probe sample
    // of a loop-using query doesn't absorb that cost in its timed window.
    SparkEntry.queries.get("q1_agg").foreach { fn =>
      try fn(spark, sfDir).count() catch { case _: Throwable => }
    }
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { tbl =>
      try spark.read.parquet(s"$sfDir/$tbl.parquet").count()
      catch { case _: Throwable => }
    }
    try {
      import spark.implicits._
      graft.ops.Components.connectedComponents(
        Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("i", "j")).count()
    } catch { case _: Throwable => }

    val t0 = System.nanoTime()
    val rows = SparkEntry.queries(query)(spark, sfDir).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"query":"$query","rows":$rows,"sec":$sec%.2f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
