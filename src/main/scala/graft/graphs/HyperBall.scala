package graft.graphs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.ml.Sketches

/** HyperBall (Boldi & Vigna, "In-Core Computation of Geometric
  * Centralities with HyperBall", 2013; public literature) — approximate
  * t-hop neighborhood sizes for EVERY node at once: each node carries an
  * HLL register set of its reachable ball, initialized to {self}, and
  * each round max-merges the registers of its out-neighbors. After t
  * rounds the registers sketch ball(n, t) exactly (register max-merge IS
  * set union), so one estimator pass yields |ball(n, t)| for every node
  * — the primitive behind effective-diameter and centrality
  * computations that exact per-node BFS (O(n) traversals) cannot touch
  * at scale.
  *
  * Scale posture: state is nodes·2^p register rows (p = 4 → 16 per
  * node); each round is one equi-join of the edge list against the
  * register table plus one map-side-combinable max-agg — shuffle volume
  * ∝ edges·2^p per round, never quadratic, and the merge is associative
  * so AQE/skew handling apply as usual. This is the [[Bfs]] cost model
  * with a constant 2^p factor traded for EVERY source at once (n BFS
  * runs collapse into one sketch pass).
  *
  * Cross-engine: registers ride [[Sketches.hllRegisters]] (md5-derived,
  * q100 contract) and estimates [[Sketches.hllEstimateCorrected]]
  * (build-time linear-counting LUT), so every per-node estimate is an
  * exact integer both engines reproduce (q226).
  */
object HyperBall {

  /** `edges`: integral `src`/`dst`, directed as stored (symmetrize
    * upstream for undirected balls). Returns (node, est_reachable) —
    * the estimated |ball(node, rounds)| INCLUDING the node itself —
    * for every node with at least one edge endpoint.
    *
    * `broadcastRegisters = true` ships each round's register table to
    * the edge join as a broadcast and folds the self-merge into the
    * adjacency as explicit self-loops, so a round costs ZERO exchanges:
    * the adjacency is hash-partitioned on `src` ONCE, the broadcast join
    * preserves that layout, and the (node = src, bucket) max-agg rides
    * it in place (hash(src) clusters (node, bucket)). The register table
    * is nodes·2^p rows — broadcast it whenever that fits an executor
    * (the [[LabelProp]] `broadcastLabels` posture); leave false for
    * billion-node graphs, where each round shuffles instead.
    */
  def neighborhoodSizes(edges: DataFrame, rounds: Int,
                        p: Int = 4,
                        broadcastRegisters: Boolean = false): DataFrame = {
    require(rounds >= 1 && rounds <= 8,
      s"HyperBall: rounds in [1, 8], got $rounds")
    val lvl = StorageLevel.MEMORY_AND_DISK
    if (broadcastRegisters)
      return neighborhoodSizesBroadcast(edges, rounds, p)
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .distinct().persist(lvl)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    var regs = Sketches.hllRegisters(nodes, Seq("node"), col("node"), p)
      .persist(lvl)
    regs.count()
    for (__it <- 1 to rounds) {
      val fromNbrs = e.join(regs, e("dst") === regs("node"))
        .select(e("src").as("node"), col("bucket"), col("max_rho"))
      val next = regs.unionByName(fromNbrs)
        .groupBy(col("node"), col("bucket"))
        .agg(max(col("max_rho")).cast("int").as("max_rho"))
        .persist(lvl)
      if (__it == 1) GraphExplain("hyperball round", next)
      next.count()
      regs.unpersist(blocking = false)
      regs = next
    }
    val out = Sketches.hllEstimateCorrected(regs, Seq("node"), p)
      .withColumnRenamed("est_distinct", "est_reachable")
    out.count()
    e.unpersist(blocking = false)
    out
  }

  /** Broadcast-register formulation: identical results (spec-asserted),
    * zero per-round exchanges. The self-merge `regs ∪ fromNbrs` of the
    * shuffling path is algebraically a max over {v} ∪ out-nbrs(v), so a
    * self-loop per node makes the single join cover it — and unlike the
    * union (which destroys partitioning and forces a full
    * (node, bucket) exchange of edges·2^p rows per round), the broadcast
    * join streams the src-partitioned adjacency so the max-agg needs no
    * exchange at all.
    */
  private def neighborhoodSizesBroadcast(edges: DataFrame, rounds: Int,
                                         p: Int): DataFrame = {
    val lvl = StorageLevel.MEMORY_AND_DISK
    val e0 = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val nodes = e0.select(col("src").as("node"))
      .unionByName(e0.select(col("dst").as("node"))).distinct()
      .persist(lvl)
    // Self-loops fold the "include self" merge into the join; the
    // repartition(src) layout is what every round's agg rides (hash(src)
    // clusters (src, dst), so the dedup adds no second exchange).
    val e = e0.unionByName(
        nodes.select(col("node").as("src"), col("node").as("dst")))
      .repartition(col("src"))
      .distinct()
      .persist(lvl)
    e.count()
    var regs = Sketches.hllRegisters(nodes, Seq("node"), col("node"), p)
      .persist(lvl)
    regs.count()
    for (__it <- 1 to rounds) {
      val next = e.join(broadcast(regs), e("dst") === regs("node"))
        .select(e("src").as("node"), col("bucket"), col("max_rho"))
        .groupBy(col("node"), col("bucket"))
        .agg(max(col("max_rho")).cast("int").as("max_rho"))
        .persist(lvl)
      if (__it == 1) GraphExplain("hyperball round", next)
      next.count()
      regs.unpersist(blocking = false)
      regs = next
    }
    val out = Sketches.hllEstimateCorrected(regs, Seq("node"), p)
      .withColumnRenamed("est_distinct", "est_reachable")
    out.count()
    e.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    out
  }
}
