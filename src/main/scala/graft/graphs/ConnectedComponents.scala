package graft.graphs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the step that turns near-dup
  * PAIRS (MinHash/SimHash/embedding candidates) into dedup GROUPS, so a
  * pipeline can keep one canonical document per cluster instead of dropping
  * both ends of every pair.
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with itself; each round every node takes the minimum label among itself
  * and its neighbors; at the fixpoint each node carries the minimum id of
  * its component (the canonical cluster id). Each round is a join + a
  * map-side-combinable min-aggregation — two shuffles, fully distributed —
  * and the round count is the graph diameter. Near-dup graphs are
  * overwhelmingly tiny dense clusters (diameter 1–3); for adversarial
  * long-chain graphs the round count grows, which is the known trade-off of
  * label propagation vs. the large-star/small-star family (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — same per-round
  * shape, fewer rounds; the propagation loop below is the simpler fixpoint
  * with identical output.
  *
  * The per-round `count()` is a scalar convergence probe (the same driver
  * pattern every iterative graph system uses), not a data collect. Labels
  * are localCheckpoint'ed each round to truncate lineage — without it the
  * plan doubles per iteration.
  */
object ConnectedComponents {

  /** `edges`: two columns `src`, `dst` (undirected; duplicates fine).
    * Returns (`node`, `component`) for every node with at least one edge,
    * where `component` is the minimum node id in the component.
    */
  def run(edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("component", col("node"))
      .localCheckpoint()
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds) {
      val msgs = sym.join(labels, sym("src") === labels("node"))
        .select(col("dst").as("node"), col("component"))
      // One aggregation computes BOTH the new label (min over self+neighbor
      // labels) and the node's previous label (min over the tagged own row),
      // so convergence detection is a scalar filter on the checkpointed
      // result instead of a join against the previous round — halving the
      // per-round job count, which dominates when the pair graph is small.
      val next = labels.select(col("node"), col("component"), lit(true).as("__own"))
        .unionByName(msgs.withColumn("__own", lit(false)))
        .groupBy("node").agg(
          min("component").as("component"),
          min(when(col("__own"), col("component"))).as("__old"))
        .localCheckpoint()
      changed = next.filter(col("component") < col("__old")).count()
      labels = next.select("node", "component")
      round += 1
    }
    require(changed == 0,
      s"ConnectedComponents did not converge in $maxRounds rounds")
    labels
  }
}
