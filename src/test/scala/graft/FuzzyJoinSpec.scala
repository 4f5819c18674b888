package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.FuzzyJoin
import graft.expr.{functions => gf}

/** The deletion-neighborhood fuzzy join must (a) never degenerate to an
  * all-pairs plan, (b) find EVERY pair within one whole-token edit, and
  * (c) keep high recall vs the exact all-pairs answer on real part names
  * (char edits straddling two tokens are the only misses). */
class FuzzyJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("one-token substitution / insertion / deletion pairs are always found") {
    val rows = Seq(
      (1L, "misty rose quartz"), (2L, "misty red quartz"),   // substitution
      (3L, "deep forest green"), (4L, "deep forest"),        // deletion
      (5L, "pale gold"), (6L, "pale antique gold"),          // insertion
      (7L, "unrelated words entirely")
    ).toDF("id", "name")
    val got = FuzzyJoin.selfPairs(rows, "id", "name")(
        (a, b) => lit(true))
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(Set((1L, 2L), (3L, 4L), (5L, 6L)).subsetOf(got))
    assert(!got.contains((1L, 7L)) && !got.contains((3L, 5L)))
  }

  test("candidate join is an equi hash join, not all-pairs") {
    val df = Seq((1L, "a b"), (2L, "a c"), (3L, "d e")).toDF("id", "name")
    val plan = FuzzyJoin.selfPairs(df, "id", "name")((a, b) => lit(true))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"candidate join degenerated:\n$plan")
  }

  test("recall vs exact all-pairs lev<=4 on sf0.001 part names") {
    val p = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    val a = p.select($"p_partkey".as("k1"), $"p_name".as("n1"))
    val b = p.select($"p_partkey".as("k2"), $"p_name".as("n2"))
    val exact = a.join(b, $"k1" < $"k2" && levenshtein($"n1", $"n2") <= 4)
      .select("k1", "k2").as[(Long, Long)].collect().toSet
    val scale = FuzzyJoin.selfPairs(p, "p_partkey", "p_name")(
        (x, y) => levenshtein(x, y) <= 4)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(scale.subsetOf(exact))               // precision is structural
    val recall = scale.size.toDouble / exact.size
    assert(recall >= 0.95, s"recall=$recall (${scale.size}/${exact.size})")
  }

  test("block columns restrict pairs to the block and keep recall") {
    val p = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    val a = p.select($"p_partkey".as("k1"), $"p_name".as("n1"), $"p_brand".as("b1"))
    val b = p.select($"p_partkey".as("k2"), $"p_name".as("n2"), $"p_brand".as("b2"))
    val exactBlocked = a.join(b,
        $"b1" === $"b2" && $"k1" < $"k2" && levenshtein($"n1", $"n2") <= 4)
      .select("k1", "k2").as[(Long, Long)].collect().toSet
    val scale = FuzzyJoin.selfPairs(p, "p_partkey", "p_name",
        blockCols = Seq("p_brand"))((x, y) => levenshtein(x, y) <= 4)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(exactBlocked.nonEmpty)
    assert(scale.subsetOf(exactBlocked))        // block equality is implied by the key
    val recall = scale.size.toDouble / exactBlocked.size
    assert(recall >= 0.95, s"recall=$recall (${scale.size}/${exactBlocked.size})")
  }

  test("PassJoin exact variant EQUALS all-pairs lev<=4 — no missed pairs") {
    val p = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    val a = p.select($"p_partkey".as("k1"), $"p_name".as("n1"))
    val b = p.select($"p_partkey".as("k2"), $"p_name".as("n2"))
    val exact = a.join(b, $"k1" < $"k2" && levenshtein($"n1", $"n2") <= 4)
      .select("k1", "k2").as[(Long, Long)].collect().toSet
    val pass = FuzzyJoin.selfPairsExact(p, "p_partkey", "p_name", k = 4)(
        (x, y) => levenshtein(x, y) <= 4)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(pass == exact, {
      val miss = exact -- pass; val extra = pass -- exact
      s"missed=${miss.take(5)} extra=${extra.take(5)} (${pass.size} vs ${exact.size})"
    })
  }

  test("Ratcliff-threshold PassJoin EQUALS brute-force all-pairs sim>=0.9") {
    // the f12_similarity_scale construction: sim >= θ implies
    // lev <= (1-θ)(la+lb) <= (1-θ)·2·Lmax (matched chars never exceed
    // LCS; lev <= la+lb-2·LCS), so PassJoin at that k is an exact
    // candidate superset of the similarity join — no recall contract
    val p = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    val theta = 0.9
    val lmax = p.agg(max(length($"p_name")).cast("int")).head().getInt(0)
    val k = math.ceil((1.0 - theta) * 2 * lmax).toInt // ceil: see the query
    val pass = FuzzyJoin.selfPairsExact(p, "p_partkey", "p_name", k = k,
        blockCols = Seq("p_brand"))(
        (x, y) => graft.expr.functions.similarity(x, y) >= theta)
      .select("i", "j").as[(Long, Long)].collect().toSet
    val a = p.select($"p_partkey".as("k1"), $"p_name".as("n1"), $"p_brand".as("b1"))
    val b = p.select($"p_partkey".as("k2"), $"p_name".as("n2"), $"p_brand".as("b2"))
    val exact = a.join(b, $"b1" === $"b2" && $"k1" < $"k2" &&
        graft.expr.functions.similarity($"n1", $"n2") >= theta)
      .select("k1", "k2").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(pass == exact, {
      val miss = exact -- pass; val extra = pass -- exact
      s"missed=${miss.take(5)} extra=${extra.take(5)} (${pass.size} vs ${exact.size})"
    })
  }

  test("θ=0.5 CandidateGen route EQUALS the brute-force brand-blocked " +
      "self-join — the f12_similarity_ratcliff rewrite loses no pair") {
    // round 10 moved f12_similarity_ratcliff off its quadratic
    // brand-blocked self-join (34× at 10× data) onto the same
    // measured-Lmax PassJoin + distinct-front route as the θ=0.9 query;
    // this pins the full (ids AND sim values) output equality at the
    // permissive θ=0.5, where the radius degenerates to k ≈ Lmax and the
    // distinct-string front is what carries the scaling
    val p = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    val routed = graft.ops.CandidateGen.similaritySelfPairs(p, "p_partkey",
        "p_name", theta = 0.5, blockCols = Seq("p_brand"))(
        graft.expr.functions.similarity)
      .select($"i", $"j",
        graft.expr.functions.similarity($"str_i", $"str_j").as("sim"))
      .as[(Long, Long, Double)].collect().toSet
    val a = p.select($"p_partkey".as("k1"), $"p_name".as("n1"), $"p_brand".as("b1"))
    val b = p.select($"p_partkey".as("k2"), $"p_name".as("n2"), $"p_brand".as("b2"))
    val exact = a.join(b, $"b1" === $"b2" && $"k1" < $"k2")
      .select($"k1", $"k2",
        graft.expr.functions.similarity($"n1", $"n2").as("sim"))
      .filter($"sim" >= 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty)
    assert(routed == exact, {
      val miss = exact -- routed; val extra = routed -- exact
      s"missed=${miss.take(5)} extra=${extra.take(5)} (${routed.size} vs ${exact.size})"
    })
  }

  test("no cached blocks survive a distinct-front call (round-9 leak advice)") {
    // the fronts used to persist() their groups frame with no handle
    // reaching the caller — only a global clearCache() could free it.
    // They localCheckpoint now (ContextCleaner frees the blocks on GC),
    // so the CacheManager must stay empty across a full self- and
    // cross-join call chain driven to completion.
    spark.catalog.clearCache()
    val p = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    FuzzyJoin.selfPairsExact(p, "p_partkey", "p_name", k = 2,
      blockCols = Seq("p_brand"))((x, y) => levenshtein(x, y) <= 2).count()
    val odd = p.filter($"p_partkey" % 2 === 1)
    val even = p.filter($"p_partkey" % 2 === 0)
    FuzzyJoin.pairsExact(odd, "p_partkey", "p_name", even, "p_partkey",
      "p_name", k = 2)((x, y) => levenshtein(x, y) <= 2).count()
    assert(spark.sharedState.cacheManager.isEmpty,
      "distinct-front left entries in the CacheManager")
  }

  test("PassJoin handles char edits that straddle token boundaries") {
    // exactly the miss class of the deletion-neighborhood keys
    val rows = Seq(
      (1L, "old bolt iron"), (2L, "cold rod iron"),   // 4 char edits across 2 tokens
      (3L, "abc"), (4L, "xyzabc"),                    // short strings near the k bound
      (5L, ""), (6L, "abcd"))
      .toDF("id", "name")
    val pass = FuzzyJoin.selfPairsExact(rows, "id", "name", k = 4)(
        (x, y) => levenshtein(x, y) <= 4)
      .select("i", "j").as[(Long, Long)].collect().toSet
    val a = rows.select($"id".as("k1"), $"name".as("n1"))
    val b = rows.select($"id".as("k2"), $"name".as("n2"))
    val exact = a.join(b, $"k1" < $"k2" && levenshtein($"n1", $"n2") <= 4)
      .select("k1", "k2").as[(Long, Long)].collect().toSet
    assert(pass == exact, s"$pass vs $exact")
    assert(pass.contains((1L, 2L)))   // the cross-token case specifically
  }

  test("two-table PassJoin EQUALS the cross-table all-pairs lev<=4 answer") {
    val p = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    val left = p.filter($"p_partkey" % 2 === 0)
    val right = p.filter($"p_partkey" % 2 === 1)
    val exact = left.select($"p_partkey".as("k1"), $"p_name".as("n1"))
      .join(right.select($"p_partkey".as("k2"), $"p_name".as("n2")),
        levenshtein($"n1", $"n2") <= 4)
      .select("k1", "k2").as[(Long, Long)].collect().toSet
    val pass = FuzzyJoin.pairsExact(left, "p_partkey", "p_name",
        right, "p_partkey", "p_name", k = 4)(
        (x, y) => levenshtein(x, y) <= 4)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(pass == exact,
      s"missed=${(exact -- pass).take(5)} extra=${(pass -- exact).take(5)}")
  }

  test("two-table variant matches probe rows to a dimension") {
    val dim = Seq((10L, "acid green"), (11L, "royal blue")).toDF("id", "name")
    val probe = Seq((1L, "acid lime green"), (2L, "royal blue"),
      (3L, "nothing close")).toDF("id", "name")
    val got = FuzzyJoin.pairs(probe, "id", "name", dim, "id", "name")(
        (a, b) => gf.similarity(a, b) >= 0.8)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(got.contains((2L, 11L)))
    assert(!got.exists(_._1 == 3L))
  }
  test("exact-variant candidate join stays an equi hash join (no all-pairs)") {
    val df = Seq((1L, "abcdef"), (2L, "abcxef"), (3L, "zzzzzz")).toDF("id", "name")
    val plan = FuzzyJoin.selfPairsExact(df, "id", "name", k = 2)(
        (a, b) => lit(true))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"candidate join degenerated:\n$plan")
  }

  test("exactness holds on whitespace-flanked strings (keys = verify strings)") {
    // ' abc' vs 'z abc': RAW edit distance 1 but TRIMMED distance 2 - the
    // earlier trim-on-key-side spelling could verify a pair that never
    // shared a key. Keys, lengths and verify now all read the raw string.
    val rows = Seq((1L, " abc"), (2L, "z abc"), (3L, "abc  "),
      (4L, "abc zz"), (5L, "  pale gold  "), (6L, "pale gold"))
      .toDF("id", "name")
    val a = rows.select($"id".as("k1"), $"name".as("n1"))
    val b = rows.select($"id".as("k2"), $"name".as("n2"))
    val exact = a.join(b, $"k1" < $"k2" && levenshtein($"n1", $"n2") <= 4)
      .select("k1", "k2").as[(Long, Long)].collect().toSet
    val self = FuzzyJoin.selfPairsExact(rows, "id", "name", k = 4)(
        (x, y) => levenshtein(x, y) <= 4)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(self == exact, s"missed=${exact -- self} extra=${self -- exact}")
    val odd = rows.filter($"id" % 2 === 1)
    val even = rows.filter($"id" % 2 === 0)
    val exactX = odd.select($"id".as("k1"), $"name".as("n1"))
      .join(even.select($"id".as("k2"), $"name".as("n2")),
        levenshtein($"n1", $"n2") <= 4)
      .select("k1", "k2").as[(Long, Long)].collect().toSet
    val cross = FuzzyJoin.pairsExact(odd, "id", "name", even, "id", "name",
        k = 4)((x, y) => levenshtein(x, y) <= 4)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(cross == exactX, s"missed=${exactX -- cross} extra=${cross -- exactX}")
  }

  test("seeded duplication fuzz: the distinct-string front equals the " +
      "all-pairs answer INCLUDING strings and within-group pairs") {
    // many ids per string + blocks: exercises the front's within-group
    // C(n,2) expansion, the cross-group id normalization, and that
    // str_i/str_j follow their ids through the (least, greatest) swap
    val rnd = new scala.util.Random(99L)
    val base = Vector("pale gold", "pale bold", "dark gold", "mint",
      "minty", "x", "")
    val rows = (0L until 120L).map { i =>
      (i, base(rnd.nextInt(base.length)), s"blk${rnd.nextInt(2)}")
    }.toDF("id", "name", "blk")
    val a = rows.select($"id".as("k1"), $"name".as("n1"), $"blk".as("b1"))
    val b = rows.select($"id".as("k2"), $"name".as("n2"), $"blk".as("b2"))
    val exact = a.join(b, $"b1" === $"b2" && $"k1" < $"k2" &&
        levenshtein($"n1", $"n2") <= 4)
      .select("k1", "k2", "n1", "n2")
      .as[(Long, Long, String, String)].collect().toSet
    val got = FuzzyJoin.selfPairsExact(rows, "id", "name", k = 4,
        blockCols = Seq("blk"))((x, y) => levenshtein(x, y) <= 4)
      .as[(Long, Long, String, String)].collect().toSet
    assert(got == exact,
      s"missed=${(exact -- got).take(5)} extra=${(got -- exact).take(5)}")
    // sanity: duplicates actually occurred, so within-group pairs exist
    assert(exact.exists(p => p._3 == p._4))

    // two-table variant with duplicates on both sides, strings checked
    val odd = rows.filter($"id" % 2 === 1)
    val even = rows.filter($"id" % 2 === 0)
    val exactX = odd.select($"id".as("k1"), $"name".as("n1"), $"blk".as("b1"))
      .join(even.select($"id".as("k2"), $"name".as("n2"), $"blk".as("b2")),
        $"b1" === $"b2" && levenshtein($"n1", $"n2") <= 4)
      .select("k1", "k2", "n1", "n2")
      .as[(Long, Long, String, String)].collect().toSet
    val crossGot = FuzzyJoin.pairsExact(odd, "id", "name", even, "id",
        "name", k = 4, blockCols = Seq("blk"))(
        (x, y) => levenshtein(x, y) <= 4)
      .as[(Long, Long, String, String)].collect().toSet
    assert(crossGot == exactX,
      s"missed=${(exactX -- crossGot).take(5)} extra=${(crossGot -- exactX).take(5)}")
  }

  test("seeded fuzz: every pair within k edits is found by the exact variants") {
    // guards the length-aware substring window (a proof-based pruning):
    // random strings over a small alphabet, random <= 4-edit mutants,
    // equality against the all-pairs answer - lengths span the short
    // bucket, the segment boundary and the window's indel-heavy corners
    val rnd = new scala.util.Random(20260813L)
    val ab = "abcde"
    def randStr(n: Int) = Seq.fill(n)(ab(rnd.nextInt(ab.length))).mkString
    def mutate(s: String, edits: Int): String = {
      var cur = s
      (1 to edits).foreach { _ =>
        rnd.nextInt(3) match {
          case 0 if cur.nonEmpty =>
            val p = rnd.nextInt(cur.length); cur = cur.take(p) + cur.drop(p + 1)
          case 1 =>
            val p = rnd.nextInt(cur.length + 1)
            cur = cur.take(p) + ab(rnd.nextInt(ab.length)) + cur.drop(p)
          case _ if cur.nonEmpty =>
            val p = rnd.nextInt(cur.length)
            cur = cur.take(p) + ab(rnd.nextInt(ab.length)) + cur.drop(p + 1)
          case _ => ()
        }
      }
      cur
    }
    val rows = (0 until 60).flatMap { i =>
      val s = randStr(1 + rnd.nextInt(27))
      Seq((i * 2L, s), (i * 2L + 1L, mutate(s, rnd.nextInt(5))))
    }.toDF("id", "name")
    val a = rows.select($"id".as("k1"), $"name".as("n1"))
    val b = rows.select($"id".as("k2"), $"name".as("n2"))
    val exact = a.join(b, $"k1" < $"k2" && levenshtein($"n1", $"n2") <= 4)
      .select("k1", "k2").as[(Long, Long)].collect().toSet
    val self = FuzzyJoin.selfPairsExact(rows, "id", "name", k = 4)(
        (x, y) => levenshtein(x, y) <= 4)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(self == exact, s"missed=${(exact -- self).take(8)} extra=${(self -- exact).take(8)}")
    val odd = rows.filter($"id" % 2 === 1)
    val even = rows.filter($"id" % 2 === 0)
    val exactX = odd.select($"id".as("k1"), $"name".as("n1"))
      .join(even.select($"id".as("k2"), $"name".as("n2")),
        levenshtein($"n1", $"n2") <= 4)
      .select("k1", "k2").as[(Long, Long)].collect().toSet
    val cross = FuzzyJoin.pairsExact(odd, "id", "name", even, "id", "name",
        k = 4)((x, y) => levenshtein(x, y) <= 4)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(cross == exactX,
      s"missed=${(exactX -- cross).take(8)} extra=${(cross -- exactX).take(8)}")
  }

  test("f12 trace candidate set is a superset of the declared output, " +
      "both thetas, sf0.01 — the trace writer cannot silently drop a " +
      "qualifying pair the declared query emits") {
    // The f12 oracle replays the block trace writeOracleAux exports via
    // a SECOND similaritySelfPairs run with a constant-true verify. If
    // that run's candidate layer ever diverged from the declared query's
    // (different theta plumbing, say), a qualifying pair could vanish
    // from BOTH sides and the hash would stay green — so pin here that
    // the constant-true candidate set contains every declared pair.
    val dir = "/root/testdata/sf0.01"
    for ((qname, theta) <- Seq(("f12_similarity_scale", 0.9),
                               ("f12_similarity_ratcliff", 0.5))) {
      val trace = graft.ops.CandidateGen.similaritySelfPairs(
          spark.read.parquet(s"$dir/part.parquet"), "p_partkey", "p_name",
          theta = theta, blockCols = Seq("p_brand"))((_, _) => lit(1.0))
        .select("i", "j").as[(Long, Long)].collect().toSet
      val declared = SparkEntry.queries(qname)(spark, dir)
        .select("k1", "k2").as[(Long, Long)].collect().toSet
      assert(declared.nonEmpty, s"$qname produced no pairs at sf0.01")
      assert(declared.subsetOf(trace),
        s"$qname: ${(declared -- trace).size} declared pairs missing " +
          s"from the trace candidate set, e.g. ${(declared -- trace).take(5)}")
    }
  }

}
