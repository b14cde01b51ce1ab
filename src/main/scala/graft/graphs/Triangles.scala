package graft.graphs

import org.apache.spark.sql.DataFrame
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
  * exact skew that kills the naive three-way self-join. All three
  * passes are equi-joins (spec asserts no CartesianProduct); per-node
  * counts are a map-side-combinable explode + groupBy.
  */
object Triangles {

  /** Per-node triangle participation counts from a directed/duplicated
    * edge list (`src`, `dst` integral; self-loops dropped, duplicates
    * and reverse duplicates collapse into one undirected edge). Only
    * nodes in ≥ 1 triangle appear — union with the node set for the
    * zero-filled variant.
    */
  def nodeTriangles(edges: DataFrame): DataFrame = {
    // Undirected canonical form: (u < v), deduped.
    val und = edges
      .select(least(col("src"), col("dst")).cast("long").as("u"),
        greatest(col("src"), col("dst")).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // Orient u—v from lower (deg, node) to higher; carry the head's rank
    // so the wedge join can order its two heads without re-joining deg.
    val adj = und
      .join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
      .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("a"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("b"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("dv"))
          .otherwise(col("du")).as("db"))
    // Wedges b ← a → c with rank(b) < rank(c); close with oriented b → c.
    // Column names disjoint across the two sides — the self-join is on
    // plain distinct attributes, no dataset-id disambiguation in play.
    val e1 = adj.select(col("a"), col("b"), col("db"))
    val e2 = adj.select(col("a").as("a2"), col("b").as("c"), col("db").as("dc"))
    val wedges = e1.join(e2,
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
