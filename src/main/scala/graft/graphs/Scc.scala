package graft.graphs

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Strongly connected components over a DIRECTED edge list — the cycle
  * structure [[ConnectedComponents]] cannot see (its propagation treats
  * edges as symmetric): redirect chains that loop, mutually-linking page
  * clusters, money cycles in transaction graphs, recurrent state groups
  * in session state machines.
  *
  * Algorithm: forward-max coloring + backward containment (the FW-BW
  * coloring family — Fleischer/Hendrickson/Pinar's divide-and-conquer
  * specialized to max-id pivots, as in Orzan's distributed coloring;
  * public literature). Each PHASE on the remaining subgraph:
  *
  *  1. colors: every node starts as its own color; forward hops take the
  *     MAX color over in-neighbors to a fixpoint — color(u) is then the
  *     max id among u's ancestors (including u).
  *  2. roots r (color(r)=r): SCC(r) = nodes colored r that REACH r.
  *     Marks start at the roots and hop along reversed edges restricted
  *     to same-colored nodes (sound: any u→…→r path through w implies w
  *     and r are mutually reachable, which forces color(w)=r).
  *     Every root's containment runs simultaneously.
  *  3. marked nodes exit with scc_id = MIN member id (the
  *     [[ConnectedComponents]] canonical-label convention); unmarked
  *     nodes form the next phase's subgraph.
  *
  * A phase retires every root-containing SCC (at minimum the global
  * max-id node's), so acyclic regions drain in ONE phase (every node is
  * its own root) and phase count is bounded by the depth of SCCs
  * stacked under higher-id ancestors — small on real graphs.
  *
  * Same RDD-fixpoint rationale as [[ConnectedComponents]]: adjacency is
  * grouped to NODE GRAIN (the r14 Bfs lesson — per-round joins rebuild
  * per-key maps of what they join, so edge-grain adjacency pays
  * edge-grain rebuilds) and hash-partitioned once; every round is one
  * map-side-combined shuffle of (long, long) messages plus narrow
  * co-partitioned joins. Nothing data-sized touches the driver.
  */
object Scc {

  /** `edges`: integral `src`/`dst`, directed. Returns (`node`, `scc_id`)
    * for every node with at least one edge endpoint, `scc_id` = minimum
    * node id in the strongly connected component (singletons map to
    * themselves). `maxRounds` bounds each propagation fixpoint,
    * `maxPhases` the outer loop; non-convergence fails loudly.
    */
  def run(edges: DataFrame, maxPhases: Int = 20,
          maxRounds: Int = 100): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    // Node universe BEFORE the self-loop filter: a node whose only edge
    // is a self-loop is a singleton SCC, not absent from the output.
    val rawPairs = edges
      .select(col("src").cast("long"), col("dst").cast("long"))
      .distinct()
      .as[(Long, Long)].rdd.persist(StorageLevel.MEMORY_AND_DISK)
    val ePairs = rawPairs.filter { case (s, d) => s != d }
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = ePairs.count()
    val parts = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong,
      nEdges * 2 / 500000L + 1)).toInt
    val part = new HashPartitioner(parts)
    // src-keyed edges and node-grain forward adjacency, partitioned once
    // (per-phase joins against them are narrow).
    val eBySrc: RDD[(Long, Long)] = ePairs.partitionBy(part)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val adjOut: RDD[(Long, Array[Long])] = eBySrc
      .groupByKey(part).mapValues(_.toArray)
      .persist(StorageLevel.MEMORY_AND_DISK)

    var remaining: RDD[(Long, Unit)] = rawPairs
      .flatMap { case (s, d) => Iterator(s, d) }
      .map(n => (n, ())).reduceByKey(part, (a, _) => a)
      .persist(StorageLevel.MEMORY_AND_DISK)
    var nRemaining = remaining.count()
    val done = scala.collection.mutable.ArrayBuffer.empty[RDD[(Long, Long)]]
    var phase = 0

    while (nRemaining > 0 && phase < maxPhases) {
      // --- 1. forward max-coloring to fixpoint (ancestors' max id) ---
      var colors: RDD[(Long, Long)] = remaining.mapValues(_ => 0L)
        .mapPartitions(_.map { case (n, _) => (n, n) }, preservesPartitioning = true)
        .persist(StorageLevel.MEMORY_AND_DISK)
      var changed = 1L
      var round = 0
      while (changed > 0 && round < maxRounds) {
        val msgs = colors.join(adjOut)
          .flatMap { case (_, (c, nbrs)) => nbrs.iterator.map(v => (v, c)) }
          .reduceByKey(part, math.max(_: Long, _: Long))
        // cogroup keeps only nodes that still exist (own nonEmpty):
        // messages into retired nodes vanish, retired nodes never send.
        // Change detection rides the materializing count() through a
        // per-round accumulator instead of a second colors⋈next job —
        // sound for the zero/nonzero decision: a task increments only on
        // a GENUINE m > o, so retries/speculation can inflate a nonzero
        // count but can never turn a converged round into a changed one
        // (or vice versa).
        val acc = spark.sparkContext.longAccumulator(s"sccColorChanged$phase-$round")
        val next = colors.cogroup(msgs).flatMapValues { case (own, in) =>
          own.headOption.map { o =>
            val m = (in ++ Iterator(o)).max
            if (m > o) acc.add(1L)
            m
          }
        }.persist(StorageLevel.MEMORY_AND_DISK)
        next.count()
        changed = acc.value
        colors.unpersist(blocking = false)
        colors = next
        round += 1
      }
      require(changed == 0,
        s"Scc: coloring did not converge in $maxRounds rounds (phase $phase)")

      // --- 2. backward containment from the roots, inside color class ---
      // Restrict the reversed adjacency to SAME-COLOR edges once per
      // phase: every mark carried to u then necessarily equals
      // color(u), so no per-round color filtering is needed — and a
      // mixed-color successor's mark can never shadow the valid one (a
      // max-reduce over unrestricted messages would drop roots).
      val adjInSame: RDD[(Long, Array[Long])] = eBySrc
        .join(colors)
        .map { case (u, (x, cu)) => (x, (u, cu)) }
        .join(colors)
        .filter { case (_, ((_, cu), cx)) => cu == cx }
        .map { case (x, ((u, _), _)) => (x, u) }
        .groupByKey(part).mapValues(_.toArray)
        .persist(StorageLevel.MEMORY_AND_DISK)
      var marked: RDD[(Long, Long)] = colors
        .filter { case (n, c) => n == c }
        .persist(StorageLevel.MEMORY_AND_DISK)
      var grew = 1L
      round = 0
      while (grew > 0 && round < maxRounds) {
        val msgs = marked.join(adjInSame)
          .flatMap { case (_, (r, preds)) => preds.iterator.map(u => (u, r)) }
          .reduceByKey(part, math.max(_: Long, _: Long))
        // marks are final once set; arriving root == color(u) by
        // construction of adjInSame.
        val fresh = msgs.subtractByKey(marked)
          .persist(StorageLevel.MEMORY_AND_DISK)
        grew = fresh.count()
        if (grew > 0) {
          val next = marked.union(fresh)
            .reduceByKey(part, (a, _) => a)
            .persist(StorageLevel.MEMORY_AND_DISK)
          next.count()
          marked.unpersist(blocking = false)
          marked = next
        }
        fresh.unpersist(blocking = false)
        round += 1
      }
      require(grew == 0,
        s"Scc: containment did not converge in $maxRounds rounds (phase $phase)")

      // --- 3. retire marked SCCs with min-member ids ---
      val minByRoot = marked.map { case (n, r) => (r, n) }
        .reduceByKey(math.min(_: Long, _: Long))
      val out = marked.map { case (n, r) => (r, n) }
        .join(minByRoot)
        .map { case (_, (n, m)) => (n, m) }
        .persist(StorageLevel.MEMORY_AND_DISK)
      out.count()
      done += out

      val nextRemaining = remaining.subtractByKey(marked)
        .partitionBy(part)
        .persist(StorageLevel.MEMORY_AND_DISK)
      nRemaining = nextRemaining.count()
      remaining.unpersist(blocking = false)
      colors.unpersist(blocking = false)
      marked.unpersist(blocking = false)
      adjInSame.unpersist(blocking = false)
      remaining = nextRemaining
      phase += 1
    }
    require(nRemaining == 0,
      s"Scc: $nRemaining nodes unassigned after $maxPhases phases")
    val df =
      if (done.isEmpty)
        // empty node universe: empty result with the declared shape
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("node",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("scc_id",
              org.apache.spark.sql.types.LongType))))
      else done.reduce(_ union _).toDF("node", "scc_id")
    rawPairs.unpersist(blocking = false)
    ePairs.unpersist(blocking = false)
    eBySrc.unpersist(blocking = false)
    adjOut.unpersist(blocking = false)
    df
  }

  /** Condensation DAG — the graph OVER the SCCs: one edge (scc_a,
    * scc_b) per pair of distinct components with at least one original
    * edge between them. Always acyclic (contracting the cycles is the
    * point); this is the readout dependency analysis actually consumes
    * (what can run in parallel, what orders what). Two broadcast-sized
    * label joins on top of [[run]].
    */
  def condensation(edges: DataFrame, maxPhases: Int = 20,
                   maxRounds: Int = 100): DataFrame =
    condensationFromLabels(edges, run(edges, maxPhases, maxRounds))

  /** [[condensation]] over a PRECOMPUTED (`node`, `scc_id`) label table
    * (the [[run]] output shape): in a real pipeline the SCC fixpoint is
    * materialized once and every readout consumes it — passing labels in
    * keeps one fixpoint serving the label, condensation, and histogram
    * surfaces instead of three.
    */
  def condensationFromLabels(edges: DataFrame, labels: DataFrame): DataFrame =
    edges.select(col("src").cast("long"), col("dst").cast("long"))
      .join(labels.withColumnRenamed("node", "src")
        .withColumnRenamed("scc_id", "scc_a"), Seq("src"))
      .join(labels.withColumnRenamed("node", "dst")
        .withColumnRenamed("scc_id", "scc_b"), Seq("dst"))
      .filter(col("scc_a") =!= col("scc_b"))
      .select(col("scc_a"), col("scc_b")).distinct()

  /** SCC-size histogram — (size, n_sccs); the cycle-structure readout
    * (how much of the graph sits in nontrivial cycles vs singletons).
    */
  def sizeHistogram(edges: DataFrame, maxPhases: Int = 20,
                    maxRounds: Int = 100): DataFrame =
    sizeHistogramFromLabels(run(edges, maxPhases, maxRounds))

  /** [[sizeHistogram]] over a precomputed label table (see
    * [[condensationFromLabels]] for the one-fixpoint-many-readouts
    * rationale).
    */
  def sizeHistogramFromLabels(labels: DataFrame): DataFrame =
    labels
      .groupBy(col("scc_id")).agg(count(lit(1)).as("size"))
      .groupBy(col("size")).agg(count(lit(1)).as("n_sccs"))
}
