package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection utility: `runMain graft.PlanCheck <sfDir> <query...>`
  * prints the formatted physical plan and the timed row count for each
  * named query — the .explain feedback loop the builder prompt mandates. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        println(s"\n========== $name ==========")
        val df = fn(spark, sfDir)
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        val t0 = System.nanoTime()
        try {
          val n = df.count()
          println(f"rows=$n%d  time=${(System.nanoTime() - t0) / 1e9}%.2f s")
        } catch {
          case e: Throwable =>
            println(s"FAILED after ${(System.nanoTime() - t0) / 1e9}%.2f s: " +
              e.toString.take(500))
        }
      }
    }
    spark.stop()
  }
}
