package graft

/** Dev tool (test scope, not library surface): time named SparkEntry
  * queries at a given SF dir with the Bench session config.
  *
  *   sbt "Test/runMain graft.TimeQ /root/testdata/sf0.1 q1_agg ..."
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.get("q1_agg").foreach(f =>
      try f(spark, sfDir).count() catch { case _: Throwable => })
    args.drop(1).foreach { name =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"TIMING $name ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
