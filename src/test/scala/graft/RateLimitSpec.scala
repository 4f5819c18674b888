package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.RateLimit
import graft.ops.{TextOps, Fingerprint}

/** T3 pacing/retry semantics + the small P3/D3 completions. */
class RateLimitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("token bucket paces acquisitions") {
    val b = new RateLimit.TokenBucket(ratePerSec = 50.0) // 20ms/token
    val t0 = System.nanoTime()
    (1 to 6).foreach(_ => b.acquire())
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    // first token free (full bucket), 5 more at 20ms each ≥ ~100ms
    assert(elapsedMs >= 80, s"too fast: $elapsedMs ms")
  }

  test("withRetries retries with backoff then succeeds") {
    var calls = 0
    val out = RateLimit.withRetries(3, baseDelayMs = 1) {
      calls += 1
      if (calls < 3) sys.error("flaky")
      "ok"
    }
    assert(out == "ok" && calls == 3)
    intercept[RuntimeException] {
      RateLimit.withRetries(2, baseDelayMs = 1) { sys.error("always") }
    }
  }

  test("foreachRateLimited visits every row with one client per partition") {
    val acc = spark.sparkContext.longAccumulator("visited")
    val df = (1 to 20).toDF("v").repartition(4)
    RateLimit.foreachRateLimited(df, ratePerSec = 1000.0)(() => "client") {
      (_, _) => acc.add(1)
    }
    assert(acc.value == 20)
  }

  test("urlResolve: absolute passes, root-relative and relative join base") {
    val df = Seq("https://other.org/x", "/node/123", "rel/page").toDF("href")
    val got = df.select(TextOps.urlResolve(lit("https://www.fda.gov/"), $"href").as("u"))
      .as[String].collect().toList
    assert(got == List("https://other.org/x",
      "https://www.fda.gov/node/123", "https://www.fda.gov/rel/page"))
  }

  test("skipProcessed drops already-done ids (D3)") {
    val in = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("id", "v")
    val done = Seq(Tuple1("b")).toDF("id")
    val left = Fingerprint.skipProcessed(in, done, "id")
      .select("id").as[String].collect().toSet
    assert(left == Set("a", "c"))
  }
}
