package graft.graphs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge list — the graph-centrality
  * primitive a curation pipeline uses to weight documents/items by link
  * structure (the original web-scale use case; here gated on an item
  * co-occurrence graph).
  *
  * Determinism contract: ranks are SCALED LONGS (fixed-point, `scale` =
  * 1e12), every step pure integer arithmetic —
  *   contrib(u) = r(u) div outdeg(u)        (integer division)
  *   r'(v) = (15 · scale) div 100 + (85 · Σ_u contrib(u)) div 100
  * — so the sum is exact, commutative and order-independent under any
  * partitioning, and a SQL oracle replays it bit-for-bit with unrolled
  * CTEs (all values non-negative, so truncating `div` ≡ DuckDB's
  * flooring `//`). The float formulation would be partitioning-dependent
  * in the 15th digit; the integer one loses at most 1/scale per hop,
  * far below any ranking-relevant difference.
  *
  * Overflow: Σ ranks ≤ nodes · scale (mass only shrinks: damping takes
  * 15% per hop, dangling mass vanishes), so the worst single-node inflow
  * is the whole mass and `85 · Σ contribs` must stay under Long.Max —
  * i.e. nodes · scale ≲ Long.Max/100. The DEFAULT therefore derives the
  * scale from the materialized node count: `min(1e12, Long.Max/100/n)`,
  * which equals the historical 1e12 for every graph under ~9.2·10⁴
  * nodes and degrades precision (never safety) as graphs grow. Below
  * the 1e6 precision floor (≳9.2·10¹⁰ nodes) auto REFUSES with the
  * sizing formula rather than silently ranking at garbage precision —
  * past that point the fixed-point formulation needs 128-bit
  * accumulation, not a smaller scale. An EXPLICIT scale is validated
  * against the same bound up front — the job fails with the formula in
  * the message instead of an ANSI overflow mid-iteration.
  *
  * Scale posture: the degrees are folded into a contribution-ready
  * adjacency (src, dst, deg) ONCE, hash-partitioned on `src` and
  * persisted — each iteration then costs one equi-join of the (node-
  * sized) rank table against that layout plus ONE map-side-combinable
  * shuffle (groupBy dst of (long, long) messages), with no per-round
  * degree recompute or node-set rebuild. The iteration count is FIXED
  * (the operator is a k-hop centrality score, not a fixpoint — near-
  * dup/recommender use sites want a handful of hops), so the driver
  * loop is bounded and each round's plan is small. Nodes with no
  * outgoing edges contribute nothing (standard dangling-mass drop;
  * total mass declines, rankings unaffected for comparison use).
  */
object PageRank {

  /** `edges`: integral `src`, `dst` columns, directed (symmetrize
    * upstream for undirected graphs); duplicate edges are collapsed.
    * Returns (node, rank_fp) for every node that appears as a source or
    * destination, rank_fp the fixed-point long rank after `iterations`
    * damped hops from a uniform `scale` start. `scale = 0` (the default)
    * means AUTO: derived overflow-safe from the node count (see the
    * object doc); pass an explicit value when a downstream consumer —
    * such as a replaying oracle — pins the fixed-point base.
    * The returned DataFrame is
    * MATERIALIZED (checkpointed) before returning — an iterative operator
    * is always consumed, and materializing here lets the persisted edge
    * list be released instead of leaking into the caller's session.
    *
    * Fault posture: by default each iteration truncates lineage with
    * `localCheckpoint` — blocks live only on executors, so losing an
    * executor mid-run kills the job (acceptable for a bounded handful of
    * iterations re-run from scratch). Pass `reliable = true` to write
    * each round to the cluster checkpoint dir instead (requires
    * `spark.sparkContext.setCheckpointDir`), trading per-round I/O for
    * executor-loss recovery — the same knob, same reasoning, as
    * [[ConnectedComponents.run]].
    */
  def run(edges: DataFrame, iterations: Int = 3,
          scale: Long = 0L, reliable: Boolean = false,
          broadcastRanks: Boolean = false): DataFrame = {
    require(iterations >= 1 && iterations <= 20,
      s"PageRank: iterations in [1, 20], got $iterations")
    require(scale == 0L || scale >= 1000L,
      s"PageRank: scale >= 1000 (or 0 for auto), got $scale")
    if (reliable) require(
      edges.sparkSession.sparkContext.getCheckpointDir.isDefined,
      "reliable=true needs spark.sparkContext.setCheckpointDir(...) first")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // Contribution-ready adjacency, built ONCE with a single exchange:
    // hash(src) already clusters (src, dst), so the dedup aggregate adds
    // no second shuffle, and the out-degree is a window count within the
    // same layout instead of a groupBy + self-join. The loop then only
    // ever touches these two cached tables — no per-iteration degree
    // recompute or node-set rebuild.
    //
    // `broadcastRanks = true` (the [[LabelProp]] `broadcastLabels`
    // posture: right whenever the NODE table fits an executor —
    // checkpointed rounds lose the size stats AQE would need to choose
    // this itself) instead partitions the adjacency on `dst` and ships
    // each hop's node-sized rank table as a broadcast: the hop join then
    // streams the persisted layout unmoved and the groupBy(dst) inflow
    // sum rides it in place — ZERO per-hop exchanges instead of a rank
    // exchange plus the contribution shuffle. The out-degree becomes a
    // broadcast-joined node-sized side table (the window over src would
    // need the src layout back). Results identical (spec-asserted):
    // same integer arithmetic over the same groups.
    val adj = if (broadcastRanks) {
      val dedup = edges
        .select(col("src").cast("long"), col("dst").cast("long"))
        .repartition(col("dst"))
        .distinct()
      val degs = dedup.groupBy(col("src").as("__dn"))
        .agg(count(lit(1)).as("__deg"))
      dedup.join(broadcast(degs), col("src") === col("__dn"))
        .select(col("src"), col("dst"), col("__deg"))
        .persist(lvl)
    } else edges
      .select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(col("src"))
      .distinct()
      .withColumn("__deg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .persist(lvl)
    val nodes = adj.select(col("src").as("node"))
      .union(adj.select(col("dst").as("node"))).distinct()
      .persist(lvl)
    adj.count()
    val n = nodes.count()
    // Safe-scale bound: worst-case single-node inflow is the entire
    // starting mass n·s, and the hot expression is `85 * inflow` — keep
    // n·s ≤ Long.Max/100 (margin over 85). The auto default takes the
    // largest safe scale capped at the historical 1e12, so small graphs
    // are bit-identical to the old fixed default; an explicit scale past
    // the bound fails HERE with the sizing formula, not mid-iteration
    // with an ANSI overflow.
    val safeCap = Long.MaxValue / 100L / math.max(n, 1L)
    val s = if (scale != 0L) scale else math.max(1000000L, math.min(1000000000000L, safeCap))
    require(s <= safeCap,
      s"PageRank: scale $s overflows at $n nodes — need nodes*scale <= " +
        s"Long.Max/100; pass scale <= $safeCap")
    val base = lit(15L * s / 100L)
    var rank = nodes.select(col("node"), lit(s).as("rank_fp"))
    for (__it <- 1 to iterations) {
      val rankSide = if (broadcastRanks) broadcast(rank) else rank
      val contribs = rankSide
        .join(adj, rankSide("node") === adj("src"))
        .select(col("dst").as("node"),
          expr("rank_fp div __deg").as("__c"))
        .groupBy(col("node")).agg(sum(col("__c")).as("__in"))
      // LEFT join keeps sink-only / source-only nodes alive at the base
      // rank (they receive no mass but stay rankable). Under
      // broadcastRanks the contribution table is node-sized too, so the
      // completion join broadcasts it rather than exchanging both sides.
      val contribSide = if (broadcastRanks) broadcast(contribs) else contribs
      val next = nodes.join(contribSide, Seq("node"), "left")
        .select(col("node"),
          (base + expr("(85 * coalesce(__in, CAST(0 AS BIGINT))) div 100"))
            .as("rank_fp"))
      if (__it == 1) GraphExplain("pagerank round", next)
      // Lazy checkpoints keep the loop at zero jobs; the single action
      // below materializes every round's boundary in one pass.
      rank = if (reliable) next.checkpoint(eager = false)
             else next.localCheckpoint(eager = false)
    }
    // Materialize the final (and, through the lazy chain, every
    // intermediate) checkpoint so the plan no longer references the
    // cached tables, then release them.
    rank.count()
    adj.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    rank
  }
}
