package graft.graphs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Triangle counting over an undirected graph — the local-clustering
  * primitive (community detection, link-spam scoring for document
  * graphs; the graph-side sibling of [[PageRank]] over the same item
  * co-occurrence edges).
  *
  * Algorithm: the degree-ordered wedge join (the open-literature
  * MapReduce formulation — Suri & Vassilvitskii's "Counting Triangles
  * and the Curse of the Last Reducer"). Orient every undirected edge
  * from its lower-rank to its higher-rank endpoint, rank = (degree,
  * node) lexicographic; each triangle {a, b, c} then materializes as
  * EXACTLY ONE wedge b ← a → c with (b, c) rank-ordered plus the single
  * closing oriented edge b → c — no multiple counting, no direction
  * enumeration.
  *
  * Why degree orientation is the 100 TB posture: out-degree under rank
  * orientation is bounded by O(√E) for ANY degree distribution (a node
  * of degree d only points at neighbors of rank ≥ its own, and at most
  * √E nodes have degree ≥ √E) — so the wedge join Σ outdeg² stays
  * polynomial even when a celebrity node has a million neighbors, the
  * exact skew that kills the naive three-way self-join. All joins are
  * equi-joins (spec asserts no CartesianProduct).
  *
  * Plan shape (the [[PageRank]] adjacency idiom): symmetrize, then
  * `repartition(src)` so the dedup `distinct` RIDES the layout (hash
  * clustering on `src` satisfies the distinct's clustered distribution —
  * no second exchange) and the src-degree is a window count in place;
  * one more exchange on `dst` window-counts the other endpoint's degree
  * (symmetric graph: in-degree ≡ degree). Orientation is then a
  * row-local FILTER — each undirected edge survives exactly once, no
  * dedup join, no degree-table joins. The oriented adjacency feeds the
  * wedge self-join (both sides need the same `a`-hash exchange, which
  * Spark's ReusedExchange dedups) and the closing-edge join.
  */
object Triangles {

  /** Per-node triangle participation counts from a directed/duplicated
    * edge list (`src`, `dst` integral; self-loops dropped, duplicates
    * and reverse duplicates collapse into one undirected edge). Only
    * nodes in ≥ 1 triangle appear — union with the node set for the
    * zero-filled variant.
    */
  def nodeTriangles(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .filter(col("src") =!= col("dst"))
    // Symmetrized multigraph → dedup + both endpoint degrees in exactly
    // two exchanges, zero joins.
    val dir = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("src"))
      .distinct()
      .withColumn("du", count(lit(1)).over(Window.partitionBy(col("src"))))
      .repartition(col("dst"))
      .withColumn("dv", count(lit(1)).over(Window.partitionBy(col("dst"))))
    // Keep only the low-rank → high-rank orientation: each undirected
    // edge appears in `dir` once per direction, so the filter IS the
    // orientation step and the dedup at once.
    val adj = dir
      .filter(col("du") < col("dv") ||
        (col("du") === col("dv") && col("src") < col("dst")))
      .select(col("src").as("a"), col("dst").as("b"), col("dv").as("db"))
    // Wedges b ← a → c with rank(b) < rank(c); close with oriented b → c.
    // Column names disjoint across the two sides — the self-join is on
    // plain distinct attributes, no dataset-id disambiguation in play.
    val e2 = adj.select(col("a").as("a2"), col("b").as("c"), col("db").as("dc"))
    val wedges = adj.join(e2,
      col("a") === col("a2") &&
        (col("db") < col("dc") ||
          (col("db") === col("dc") && col("b") < col("c"))))
      .select(col("a"), col("b"), col("c"))
    val closing = adj.select(col("a").as("b"), col("b").as("c"))
    val triangles = wedges.join(closing, Seq("b", "c"))
    triangles
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
  }

  /** Top-k triangle-heavy nodes, unique-tiebroken — TakeOrdered, never a
    * global sort.
    */
  def topTriangleNodes(edges: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"topTriangleNodes: k >= 1, got $k")
    nodeTriangles(edges)
      .orderBy(col("n_triangles").desc, col("node").asc)
      .limit(k)
  }
}
