package graft.graphs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-round synchronous label propagation (Raghavan et al. 2007) —
  * community detection by iterated plurality vote: every node starts
  * labeled with its own id, and each round simultaneously adopts the
  * most frequent label among its in-neighbors (ties broken by the
  * SMALLEST label, making every round a pure function of the previous
  * one — the asynchronous/random variants of the paper are deliberately
  * traded away for cross-engine determinism, the same contract as
  * [[PageRank]]'s fixed-point arithmetic).
  *
  * Fixed rounds, not convergence-detection: LPA on dense graphs can
  * oscillate under synchronous update, and a bounded k-round vote is the
  * honest distributed semantics (it also keeps the driver loop bounded
  * and every round's plan identical — the [[PageRank]] argument).
  *
  * Scale posture: the adjacency is deduped and hash-partitioned ONCE and
  * persisted; each round is one equi-join of the node-sized label table
  * against that layout plus TWO map-side-combinable aggregations (the
  * (dst, label) vote count collapses per-partition before its shuffle;
  * the per-dst argmax folds over at most |distinct neighbor labels|
  * rows). Lazy local checkpoints collapse the loop into one job at the
  * final action, truncating lineage per round.
  */
object LabelProp {

  /** `edges`: integral `src`, `dst`, directed (symmetrize upstream for
    * undirected semantics); duplicates collapse. Returns (node, label)
    * after `rounds` synchronous votes for every node appearing as source
    * or destination; a node with no in-edges keeps its previous label.
    * Materialized before returning (the [[PageRank.run]] lifecycle), so
    * the internal caches are released rather than leaked.
    *
    * `broadcastLabels = true` ships each round's node-sized label table
    * to the edge join as a broadcast instead of a shuffle join — the
    * right call whenever the node set fits an executor (checkpointed
    * rounds lose size statistics, so AQE cannot make this call by
    * itself). Results are identical (spec-asserted); leave it false for
    * graphs whose LABEL TABLE alone is too big to broadcast (billions of
    * nodes), where each round must shuffle instead.
    */
  def run(edges: DataFrame, rounds: Int = 4,
          reliable: Boolean = false,
          broadcastLabels: Boolean = false): DataFrame = {
    require(rounds >= 1 && rounds <= 20,
      s"LabelProp: rounds in [1, 20], got $rounds")
    if (reliable) require(
      edges.sparkSession.sparkContext.getCheckpointDir.isDefined,
      "reliable=true needs spark.sparkContext.setCheckpointDir(...) first")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // Partition key: with broadcast labels the per-round join streams the
    // adjacency unmoved, so hash(dst) lets BOTH vote aggregations ride
    // the persisted layout in place (hash(dst) clusters (dst, lab) and
    // (dst) alike) — zero per-round exchanges instead of two. On the
    // shuffling path the label join is the reusable exchange, so keep
    // hash(src) there.
    val adjKey = if (broadcastLabels) col("dst") else col("src")
    val adj = edges
      .select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(adjKey)
      .distinct()
      .persist(lvl)
    adj.count()
    val nodes = adj.select(col("src").as("node"))
      .union(adj.select(col("dst").as("node"))).distinct()
    // A node with no in-edges never receives a vote, so its label is its
    // own id FOREVER — computed once, unioned into every round's result
    // instead of a per-round left join (one stage fewer per round; empty
    // on symmetric graphs).
    val noIn = nodes
      .join(adj.select(col("dst").as("node")).distinct(), Seq("node"), "left_anti")
      .select(col("node"), col("node").as("lab"))
      .persist(lvl)
    noIn.count()
    var labels = nodes.select(col("node"), col("node").as("lab"))
    for (__it <- 1 to rounds) {
      // Plurality vote: count each label among in-neighbors, then argmax
      // with min-label tiebreak — max of (count, -label) structs, the
      // kmeansAssign idiom (struct comparison is lexicographic). The
      // vote covers exactly the nodes with >= 1 in-edge; the constant
      // no-in-edge rows complete the node set.
      val labelSide = if (broadcastLabels) broadcast(labels) else labels
      val next = labelSide.join(adj, labelSide("node") === adj("src"))
        .groupBy(col("dst"), col("lab")).agg(count(lit(1)).as("__c"))
        .groupBy(col("dst"))
        .agg(max(struct(col("__c").as("c"), (-col("lab")).as("nl"))).as("__b"))
        .select(col("dst").as("node"), (-col("__b.nl")).as("lab"))
        .unionByName(noIn)
      if (__it == 1) GraphExplain("label_prop round", next)
      labels = if (reliable) next.checkpoint(eager = false)
               else next.localCheckpoint(eager = false)
    }
    val out = labels.select(col("node"), col("lab").as("label"))
    out.count()
    adj.unpersist(blocking = false)
    noIn.unpersist(blocking = false)
    out
  }
}
