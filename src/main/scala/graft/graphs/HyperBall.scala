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
    */
  def neighborhoodSizes(edges: DataFrame, rounds: Int,
                        p: Int = 4): DataFrame = {
    require(rounds >= 1 && rounds <= 8,
      s"HyperBall: rounds in [1, 8], got $rounds")
    val lvl = StorageLevel.MEMORY_AND_DISK
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .distinct().persist(lvl)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    var regs = Sketches.hllRegisters(nodes, Seq("node"), col("node"), p)
      .persist(lvl)
    regs.count()
    for (_ <- 1 to rounds) {
      val fromNbrs = e.join(regs, e("dst") === regs("node"))
        .select(e("src").as("node"), col("bucket"), col("max_rho"))
      val next = regs.unionByName(fromNbrs)
        .groupBy(col("node"), col("bucket"))
        .agg(max(col("max_rho")).cast("int").as("max_rho"))
        .persist(lvl)
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
}
