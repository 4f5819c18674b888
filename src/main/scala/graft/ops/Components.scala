package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the grouping tail
  * of every near-dup family: pair detection (ngram / MinHash / SimHash /
  * embedding) yields EDGES, but dedup decisions need GROUPS (a transitive
  * near-dup cluster keeps one survivor). The reference never needs this —
  * its dedup is exact-identity — but any corpus-scale near-dup pipeline
  * does.
  *
  * Algorithm: iterative min-label propagation with a pointer-jumping
  * step (label ← label of label) per round, the DataFrame rendering of
  * the classic large-star/small-star idea: propagation alone needs
  * O(diameter) rounds, the jump step collapses resolved chains so long
  * paths converge in ~O(log d). Every round is two shuffles on node id
  * (neighbor-min join + jump join); lineage is truncated per round with
  * `localCheckpoint` so the plan does not grow with iterations — the
  * standard hygiene for iterative DataFrame jobs.
  *
  * Convergence is detected by counting changed labels (one count per
  * round, like GraphX Pregel); component id = min node id reachable,
  * which makes the output deterministic and oracle-checkable (DuckDB
  * recursive CTE computes the same fixpoint).
  */
object Components {

  /** (node, component) for every node appearing in `edges`; `iCol`/`jCol`
    * name the edge endpoints. Isolated nodes (no edges) are absent by
    * construction — union the node universe afterwards if needed.
    *
    * Throws `IllegalStateException` if the fixpoint is not reached within
    * `maxIter` rounds: partially-propagated labels would silently split
    * clusters downstream (dupGroups would keep extra "survivors"), so an
    * unconverged result is never returned. */
  def connectedComponents(edges: DataFrame, iCol: String = "i",
      jCol: String = "j", maxIter: Int = 30): DataFrame = {
    // materialize the caller's edge derivation ONCE before symmetrizing:
    // the union's two branches each re-evaluate their input, so an
    // expensive upstream pair join (blocked Jaccard, cosine) would run
    // twice just to flip its columns — measured ~2x the dominant cost of
    // every near-dup clustering query at sf0.1
    // PageRank's storage discipline: e0 is TRANSIENT (read once per
    // union branch, dead once sym materializes) → serialized + released
    // below; sym is the HOT per-round table → deserialized
    val e0 = edges.select(col(iCol).as("a"), col(jCol).as("b"))
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    // cluster-safe gate (same contract as PageRank): checkpoint dir
    // configured AND the graph above the big-graph threshold → every
    // loop-lived table is a RELIABLE checkpoint (executor death
    // re-materializes instead of killing the fixed point). Gated on the
    // EDGE count — already materialized, so the count is a cheap cached
    // scan, and edges ≥ nodes makes it a conservative early trigger.
    // The count only runs when a checkpoint dir exists (zero extra jobs
    // on the single-host bench path).
    val reliable = ScaleHints.reliableConfigured(e0) &&
      e0.count() > PageRank.bigGraphNodes(e0.sparkSession)
    val sym0 = e0
      .unionByName(e0.select(col("b").as("a"), col("a").as("b")))
      .distinct()
    // reliable mode must NOT leave sym as a plain persist: its lineage
    // reads e0, whose blocks are released below — an executor death
    // would need exactly that recompute. The reliable cut materializes
    // sym to the checkpoint FS first (ScaleHints.cut persists around
    // the checkpoint so the union+distinct runs once, not twice).
    val sym = if (reliable) ScaleHints.cut(sym0, reliable = true)
      else sym0.persist()

    var labels = ScaleHints.cut(sym.select(col("a").as("node")).distinct()
      .withColumn("label", col("node")), reliable)
    // sym is materialized either way (checkpoint FS or cache), so the
    // raw edge blocks are dead weight for the rest of the loop
    // (released via the checkpoint RDD — Dataset.unpersist would no-op)
    ScaleHints.releaseCheckpoint(e0)
    var it = 0
    var changed = 1L
    while (changed > 0 && it < maxIter) {
      // neighbor-min: the smallest label among my neighbors
      val nbrMin = sym.join(labels.withColumnRenamed("node", "b"), Seq("b"))
        .groupBy(col("a").as("node")).agg(min("label").as("nbr_label"))
      val prop = labels.join(nbrMin, Seq("node"), "left_outer")
        .select(col("node"), col("label").as("old_label"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
      // pointer jump: adopt my label's own label (collapses chains).
      // One jump per round — a second jump was measured SLOWER here: the
      // self-referential frame is consumed twice per jump, and the
      // recompute across the AQE/checkpoint boundary outweighs the saved
      // rounds. Chain depth still halves every round (O(log d) total).
      val jumped = prop.join(
          prop.select(col("node").as("label"), col("label").as("jump"))
            .groupBy("label").agg(min("jump").as("jump")),
          Seq("label"), "left_outer")
        .select(col("node"), col("old_label"),
          least(col("label"), coalesce(col("jump"), col("label"))).as("label"))
      val cut = ScaleHints.cut(jumped, reliable)
      changed = cut.filter(col("label") < col("old_label")).count()
      labels = cut.select(col("node"), col("label"))
      it += 1
    }
    if (!reliable) sym.unpersist() // checkpoint files are FS-managed
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge after $maxIter rounds " +
          s"($changed labels still changing); raise maxIter")
    labels.withColumnRenamed("label", "component")
  }

  /** Near-dup GROUPS from a pair list: every transitive cluster keyed by
    * its smallest member (the survivor under keep-first policy).
    * Output: (component, n_members, members-as-sorted-csv). */
  def dupGroups(pairs: DataFrame, iCol: String = "i", jCol: String = "j"): DataFrame =
    connectedComponents(pairs, iCol, jCol)
      .groupBy("component")
      .agg(count(lit(1)).as("n_members"),
        array_join(sort_array(collect_list(col("node"))), ",").as("members"))

  /** Semi-supervised label propagation (Zhu & Ghahramani 2002, the
    * clamped variant): seed nodes carry trusted labels and NEVER change;
    * every other node adopts, per round, the modal label among its
    * currently-labeled neighbors (vote counts are integers, ties break
    * to the smallest label, unlabeled neighbors contribute nothing) —
    * the "spread human quality labels across the near-dup/link graph"
    * stage of corpus curation, where a few audited documents label their
    * whole similarity neighborhoods.
    *
    * A fixed `iters` rounds keeps the result deterministic and
    * SQL-replayable (bipartite graphs can oscillate at a fixpoint, so
    * "run to convergence" is not well-defined); labels reach distance-
    * `iters` nodes. Each round: one shuffle for the neighbor vote
    * (edges ⋈ labels on src, partial-aggregated count on (dst, label)),
    * a per-node window over ≤|labels| vote rows, and the seed clamp as
    * an anti-join; `localCheckpoint` truncates lineage per round.
    * `edges` must be symmetric (see [[PageRank.symmetrize]]). */
  def labelPropagation(edges: DataFrame, seeds: DataFrame,
      nodeCol: String, labelCol: String, iters: Int,
      srcCol: String = "src", dstCol: String = "dst",
      broadcastMaxNodes: Long = 10000000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    // e IS the hot per-round vote-join table here (no degree
    // annotation step), so its storage level follows PageRank's
    // size-gated discipline (PageRank.scala:140): above the
    // bigGraphNodes gate the SERIALIZED form stays — at 100× data a
    // deserialized edge-scale pin is the GC driver the r14 pagerank
    // stage probe measured (31–87 s of process GC variance from
    // exactly this block class); below the gate the loop table is
    // re-cut DESERIALIZED (one extra small checkpoint job) so the
    // per-round vote join never pays a deserialize, matching the
    // small-graph plan PageRank keeps for edgesDeg. The initial cut
    // is serialized either way: it is transient below the gate (only
    // the nNodes count and the re-cut read it) and IS the loop table
    // above it.
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val seed = seeds.select(col(nodeCol).cast("long").as("node"),
      col(labelCol).cast("long").as("label")).localCheckpoint(true)
    // labels is bounded by the node count: broadcast it through the vote
    // join while it fits (the edge table never shuffles per round), fall
    // back to the hash join at billion-node scale — same policy as
    // PageRank's ranks side
    val nNodes = e0.select("dst").distinct().count()
    val big = nNodes > PageRank.bigGraphNodes(e0.sparkSession)
    val e = if (big) e0 else {
      val d = e0.localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      ScaleHints.releaseCheckpoint(e0) // both copies live otherwise
      d
    }
    val hint: DataFrame => DataFrame =
      if (nNodes <= broadcastMaxNodes) broadcast else identity
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("dst").orderBy(col("__c").desc, col("label").asc)
    var labels = seed
    for (it <- 1 to iters) {
      val votes = e
        .join(hint(labels.withColumnRenamed("node", "src")), Seq("src"))
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("__c"))
      val adopted = votes.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") === 1)
        .select(col("dst").as("node"), col("label"))
        .join(hint(seed.select("node")), Seq("node"), "left_anti")
      labels = seed.unionByName(adopted)
      // lineage cut every second round (each eager checkpoint is a full
      // job; a two-round plan is still constant-size) — same cadence as
      // PageRank.iterate
      if (it % 2 == 0 && it < iters) labels = labels.localCheckpoint(true)
    }
    labels
  }

  /** Per-node triangle counts + clustering coefficient (milli) over an
    * undirected edge list — the local-density signal (community
    * tightness, spam-farm detection in a link graph, near-dup cluster
    * cohesion over a similarity graph).
    *
    * The scale shape is the degree-ORIENTATION algorithm (Suri &
    * Vassilvitskii 2011, the MapReduce standard): orient every edge from
    * the (degree, id)-smaller endpoint to the larger, enumerate wedges
    * only from each node's OUT-edges, and close them against the
    * oriented edge set. A node's out-degree is bounded by O(√|E|)
    * regardless of its in-degree, so the wedge join never explodes on a
    * hub the way naive neighbor-pair enumeration does (a degree-10⁶ hub
    * would otherwise emit 10¹² wedges). Cost: two hash shuffles over
    * edges + one over wedges; the (degree, id) order is total, so the
    * orientation — and with it the count — is deterministic.
    *
    * Each triangle {x,y,z} is found exactly once (at its unique wedge
    * apex under the orientation), then credited to all three corners. */
  def triangleCounts(edges: DataFrame, iCol: String = "i",
      jCol: String = "j"): DataFrame = {
    // canonical undirected edge set: self-loops out, one row per pair.
    // MATERIALIZED (eager, serialized — the transient-table rule): und
    // feeds deg's two union branches and the orientation join, deg feeds
    // five consumers, oriented three — left lazy, Catalyst re-plans each
    // reference as a full re-evaluation of the caller's edge derivation
    // (measured at sf0.1: the 4-table graph_triangles upstream appeared
    // 21× in one plan, 84 parquet scans; at 100 TB that is 21 scans of
    // the fact table). One cut per table bounds every upstream to ONE
    // evaluation; und/oriented are edge-sized, deg nodes-sized.
    val und = edges.select(
        least(col(iCol), col(jCol)).cast("long").as("a"),
        greatest(col(iCol), col(jCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val deg = und.select(col("a").as("node"))
      .unionByName(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    // orient by (deg, id): src = smaller endpoint under the total order
    val withDeg = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
    val oriented = withDeg.select(
        when(col("da") < col("db") ||
             (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("src"), col("b").as("dst")))
          .otherwise(struct(col("b").as("src"), col("a").as("dst")))
          .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    // wedges at apex `src`: two out-edges (src→x, src→y), x < y under the
    // same total order; closed iff x→y is an oriented edge
    val o1 = oriented.select(col("src"), col("dst").as("x"))
    val o2 = oriented.select(col("src"), col("dst").as("y"))
    val degMap = deg.select(col("node"), col("deg"))
    val wedges = o1.join(o2, Seq("src"))
      .join(degMap.select(col("node").as("x"), col("deg").as("dx")), Seq("x"))
      .join(degMap.select(col("node").as("y"), col("deg").as("dy")), Seq("y"))
      .filter(col("dx") < col("dy") ||
        (col("dx") === col("dy") && col("x") < col("y")))
      .select(col("src"), col("x"), col("y"))
    val tris = wedges.join(oriented.select(col("src").as("x"),
        col("dst").as("y")), Seq("x", "y"))
      .select(col("src").as("n1"), col("x").as("n2"), col("y").as("n3"))
    // credit all three corners, join degrees for the coefficient
    val perNode = tris.select(explode(array(col("n1"), col("n2"), col("n3")))
        .as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    deg.join(perNode, Seq("node"), "left")
      .withColumn("n_triangles", coalesce(col("n_triangles"), lit(0L)))
      .select(col("node"), col("deg"), col("n_triangles"),
        when(col("deg") >= 2,
          expr("n_triangles * 2000 div (deg * (deg - 1))"))
          .otherwise(lit(null)).cast("long").as("clustering_milli"))
  }
}
