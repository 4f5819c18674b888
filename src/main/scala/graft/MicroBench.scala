package graft

/** Throughput probe for the pair-join kernels (not part of the library
  * surface; driver-contract mains are SparkEntry/Verify/Bench). */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = spark.read.parquet("/root/testdata/sf0.1/part.parquet")
      .select("p_name").collect().map(_.getString(0))
    spark.stop()
    val n = names.length
    println(s"names: $n")

    def run(threads: Int, callsPerThread: Int): Double = {
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { tid =>
        new Thread(() => {
          val rnd = new java.util.Random(tid)
          var s = 0.0
          var i = 0
          while (i < callsPerThread) {
            s += graft.ops.Similarity.ratio(
              names(rnd.nextInt(n)), names(rnd.nextInt(n)))
            i += 1
          }
          if (s < 0) println(s) // keep alive
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    run(1, 100000) // warmup JIT
    val t1 = run(1, 1000000)
    println(f"1 thread : 1M calls in $t1%.2f s → ${1e6 / t1 / 1e6}%.2f M/s")
    val t16 = run(16, 1000000)
    println(f"16 threads: 16M calls in $t16%.2f s → ${16e6 / t16 / 1e6}%.2f M/s")
  }
}
