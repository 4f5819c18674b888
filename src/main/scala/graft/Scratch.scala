package graft

import org.apache.spark.sql.functions._

/** Temporary profiling scratchpad — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
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
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"== $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
      spark.catalog.clearCache()
    }

    val part = spark.read.parquet(s"$dir/part.parquet")
    println("part rows: " + part.count())
    part.select(size(split(trim(col("p_name")), "\\s+")).as("n"))
      .groupBy("n").count().show()

    for (i <- 1 to 2) time(s"rag_tfidf_embed #$i") {
      SparkEntry.queries("rag_tfidf_embed")(spark, dir).count()
    }
    for (i <- 1 to 2) time(s"j6_salted_join #$i") {
      SparkEntry.queries("j6_salted_join")(spark, dir).count()
    }
    for (i <- 1 to 2) time(s"j6_salted_hotkey #$i") {
      SparkEntry.queries("j6_salted_hotkey")(spark, dir).count()
    }
    spark.stop()
  }
}
