package graft.graphs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-round multi-source BFS — hop distance from a seed set, the
  * "how far is every node from the catalog roots / the flagged accounts"
  * primitive behind reachability filters and blast-radius analysis.
  *
  * Fixed rounds, the [[LabelProp]]/[[KCore]] contract: hop r can only be
  * discovered in round r, so `rounds` bounds the radius computed; nodes
  * farther than `rounds` (or unreachable) are absent from the output.
  * Once a round's frontier is empty every later round is a no-op.
  *
  * Scale posture: the adjacency is deduped and hash-partitioned ONCE and
  * persisted. Each round expands only the LAST frontier (nodes first
  * reached in the previous round) — one equi-join of the frontier against
  * the adjacency layout plus one map-side-combinable min-merge; settled
  * distances are never re-sent, so total join work across all rounds is
  * one pass over the reachable edge set (the textbook message-passing
  * BFS, not |dist| × rounds).
  */
object Bfs {

  /** `edges`: integral `src`/`dst`, directed as stored (symmetrize
    * upstream for undirected reach); `seeds`: a `node` column, hop 0.
    * Returns (node, hops) for every node within `rounds` hops of any
    * seed. Materialized before returning ([[PageRank.run]] lifecycle).
    */
  def run(edges: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 20,
      s"Bfs: rounds in [1, 20], got $rounds")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val adj = edges
      .select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(col("src"))
      .distinct()
      .persist(lvl)
    adj.count()
    var dist = seeds.select(col("node").cast("long"), lit(0L).as("hops"))
    for (i <- 1 to rounds) {
      val frontier = dist.filter(col("hops") === (i - 1))
      val reached = frontier.join(adj, frontier("node") === adj("src"))
        .select(col("dst").as("node"), lit(i.toLong).as("hops"))
      val next = dist.unionByName(reached)
        .groupBy(col("node")).agg(min(col("hops")).as("hops"))
      dist = next.localCheckpoint(eager = false)
    }
    val out = dist.select(col("node"), col("hops"))
    out.count()
    adj.unpersist(blocking = false)
    out
  }
}
