package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}

/** T3 — politeness/rate-limit pacing for external-world stages
  * (SURVEY §2.9): the reference sleeps per request with per-URL-class
  * delays, batch pauses, and exponential-backoff retries
  * (fda_watcher.py:45-55,253-262; pubmed_enrichment.py:51,125).
  *
  * In the engine this lives where external calls live: inside
  * `foreachPartition`/`mapPartitions` — one token bucket per partition, so
  * a cluster-wide rate = perPartitionRate × partitions, controlled by
  * repartitioning the work (the reference's BATCH_SIZE analog is the
  * partition, SURVEY §2.6 O6).
  */
object RateLimit {

  /** Blocking token bucket: `acquire()` waits until a token is available.
    * Deterministic-ish pacing, burst-free (capacity 1 semantics when
    * `burst = 1`). */
  final class TokenBucket(ratePerSec: Double, burst: Int = 1) extends Serializable {
    private var tokens: Double = burst.toDouble
    private var last: Long = System.nanoTime()
    def acquire(): Unit = synchronized {
      while (true) {
        val now = System.nanoTime()
        tokens = math.min(burst.toDouble, tokens + (now - last) * 1e-9 * ratePerSec)
        last = now
        if (tokens >= 1.0) { tokens -= 1.0; return }
        val needSec = (1.0 - tokens) / ratePerSec
        Thread.sleep(math.max(1L, (needSec * 1000).toLong))
      }
    }
  }

  /** Retry with exponential backoff: attempts with delay base·2^k, like
    * the reference's MAX_RETRIES=3 / RETRY_DELAY·2^attempt
    * (fda_watcher.py:253-262). */
  def withRetries[T](maxRetries: Int, baseDelayMs: Long)(body: => T): T = {
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt < maxRetries) {
      try return body
      catch {
        case e: Throwable =>
          lastErr = e
          attempt += 1
          if (attempt < maxRetries)
            Thread.sleep(baseDelayMs * (1L << (attempt - 1)))
      }
    }
    throw lastErr
  }

  /** Run `fn` for every row at ≤ `ratePerSec` per partition, with retries.
    * The client handle is built once per partition (connection-reuse
    * pattern, fda_watcher.py:365). */
  def foreachRateLimited[C](df: DataFrame, ratePerSec: Double,
      maxRetries: Int = 3, baseDelayMs: Long = 1000L)(
      mkClient: () => C)(fn: (C, Row) => Unit): Unit = {
    df.foreachPartition { (it: Iterator[Row]) =>
      val bucket = new TokenBucket(ratePerSec)
      val client = mkClient()
      it.foreach { row =>
        bucket.acquire()
        withRetries(maxRetries, baseDelayMs)(fn(client, row))
      }
    }
  }
}
