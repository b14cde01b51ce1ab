package graft.operators

import graft.SparkSpec
import graft.sources.ScaledFixtures
import graft.text.TextDedup
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Measured scale-stress for the dedup/similarity family — converting
  * the 100 TB posture from plan-shape claims into evidence on 10–20×
  * synthetic corpus growth (disjoint-universe copies, so a well-behaved
  * operator's work and output must grow ~linearly; see
  * [[ScaledFixtures]] for the growth model):
  *
  *  1. hot-bucket guard under a planted mega-cluster on the REAL
  *     minhash banding (not a synthetic bucket table): per-cell load
  *     bounded, clique output complete;
  *  2. candidate volume and verified output growth laws: exact
  *     operators scale exactly ×k, the LSH operator within tolerance;
  *  3. no plan degradation at 20×: no CartesianProduct, no global sort
  *     in any of the four family plans.
  *
  * Wall-clock exponents live in [[graft.ScaleProbe]] (a main, reported
  * not asserted — this host's multi-second VM pauses would make timing
  * assertions flaky) and are recorded in BENCH_NOTES.
  */
class ScaleSpec extends SparkSpec {

  private lazy val tmpBase = Files.createTempDirectory("graft-scale").toString

  private def docsAt(k: Int) =
    ScaledFixtures.scaledDocs(spark, sfDir, k, s"$tmpBase/docs$k")

  private def bandedOf(docs: org.apache.spark.sql.DataFrame) = {
    val sh = TextDedup.shingleHashedDocs(
      docs.filter(size(TextDedup.tokens(col("text"))) >= 3),
      "doc_id", "text", 3)
    TextDedup.minhashBands(sh, 16, 4)
  }

  test("mega-cluster on real banding: per-cell load bounded, clique complete") {
    val m = 800
    val startId = 900000000L
    val docs = docsAt(10)
      .unionByName(ScaledFixtures.megaClusterDocs(spark, m, startId))
    val banded = bandedOf(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cap = 256
    // the guard's contract on the real distribution: no (bucket, cell)
    // sees more than ~2·cap members per role side
    val (a, b) = CandidatePairs.roleSides(banded.select(col("id"), col("bk")), cap)
    val maxCell = a.unionByName(b).groupBy(col("bk"), col("__p"), col("__q"))
      .agg(count(lit(1)).as("rows")).agg(max(col("rows"))).head.getLong(0)
    assert(maxCell <= 4L * cap,
      s"hot cell has $maxCell rows (cap=$cap) — guard failed on real banding")
    // identical members bucket together in EVERY band; the guard must
    // still emit the complete C(m,2) clique exactly once
    val megaPairs = CandidatePairs.inBucketPairs(
      banded.filter(col("id") >= startId), cap).count()
    assert(megaPairs == m.toLong * (m - 1) / 2,
      s"expected ${m.toLong * (m - 1) / 2} clique pairs, got $megaPairs")
    banded.unpersist(blocking = false)
    spark.catalog.clearCache()
  }

  test("growth laws: exact operators scale exactly x4; LSH within tolerance") {
    val k = 4
    val d1 = docsAt(1); val d4 = docsAt(k)
    // candidate volume (the work proxy): ~linear, never quadratic
    val c1 = CandidatePairs.inBucketPairs(bandedOf(d1)).count()
    val c4 = CandidatePairs.inBucketPairs(bandedOf(d4)).count()
    assert(c4 <= k * c1 * 1.3 + 50,
      s"candidate volume superlinear: c1=$c1, c$k=$c4")
    assert(c4 >= k * c1 * 0.7 - 50,
      s"candidate volume collapsed: c1=$c1, c$k=$c4")
    // exact prefix-filter Jaccard: per-copy pair sets are isomorphic,
    // so output is exactly k·base
    val p1 = TextDedup.jaccardNearDupPairsPrefix(d1, "doc_id", "text",
      shingleN = 2, threshold = 0.5).count()
    val p4 = TextDedup.jaccardNearDupPairsPrefix(d4, "doc_id", "text",
      shingleN = 2, threshold = 0.5).count()
    assert(p4 == k * p1, s"exact jaccard: expected ${k * p1}, got $p4 (p1=$p1)")
    // exact fuzzy join (deletion blocking is complete at d<=1; the
    // >=2-edit copy tag forbids cross-copy matches)
    val n1 = ScaledFixtures.scaledNames(spark, sfDir, 1, s"$tmpBase/names1")
    val n4 = ScaledFixtures.scaledNames(spark, sfDir, k, s"$tmpBase/names$k")
    val f1 = graft.text.Fuzzy.editDistancePairs(n1, "c_custkey", "c_name").count()
    val f4 = graft.text.Fuzzy.editDistancePairs(n4, "c_custkey", "c_name").count()
    assert(f4 == k * f1, s"fuzzy: expected ${k * f1}, got $f4 (f1=$f1)")
    // MinHash LSH: true pairs are k·base by construction; recall is
    // probabilistic per copy's hash universe, so allow a small miss/FP
    // band around exact
    val o1 = TextDedup.nearDupPairs(d1, "doc_id", "text").count()
    val o4 = TextDedup.nearDupPairs(d4, "doc_id", "text").count()
    assert(math.abs(o4 - k * o1) <= math.max(4L, (k * o1) / 10),
      s"lsh near-dup: expected ~${k * o1}, got $o4 (o1=$o1)")
    spark.catalog.clearCache()
  }

  test("graph growth laws: triangles and PageRank mass scale exactly xk on disjoint copies") {
    val k = 4
    val e1 = ScaledFixtures.scaledEdges(spark, sfDir, 1, s"$tmpBase/edges1")
    val e4 = ScaledFixtures.scaledEdges(spark, sfDir, k, s"$tmpBase/edges$k")
    // triangles: per-copy structure is identical and components are
    // disjoint, so both the node count and the total participation sum
    // scale exactly xk
    val t1 = graft.graphs.Triangles.nodeTriangles(e1)
      .agg(count(lit(1)), sum(col("n_triangles"))).head()
    val t4 = graft.graphs.Triangles.nodeTriangles(e4)
      .agg(count(lit(1)), sum(col("n_triangles"))).head()
    assert(t4.getLong(0) == k * t1.getLong(0), s"triangle nodes: $t1 vs $t4")
    assert(t4.getLong(1) == k * t1.getLong(1), s"triangle sum: $t1 vs $t4")
    // PageRank: the integer fixed point is structure-determined, so with
    // the scale pinned each copy reproduces the base ranks exactly —
    // total mass and max rank are invariant per copy
    val s = 1000000000L
    val r1 = graft.graphs.PageRank.run(e1, iterations = 3, scale = s)
      .agg(sum(col("rank_fp")), max(col("rank_fp"))).head()
    val r4 = graft.graphs.PageRank.run(e4, iterations = 3, scale = s)
      .agg(sum(col("rank_fp")), max(col("rank_fp"))).head()
    assert(r4.getLong(0) == k * r1.getLong(0), s"rank mass: $r1 vs $r4")
    assert(r4.getLong(1) == r1.getLong(1), s"max rank: $r1 vs $r4")
    spark.catalog.clearCache()
  }

  test("tfidf cosine growth law: candidate pair keys scale exactly x4 on disjoint copies") {
    val k = 4
    val d1 = docsAt(1); val d4 = docsAt(k)
    // Suffixed tokens make cross-copy 3-grams impossible, and with idf=0
    // terms dropped every surviving weight is > 0, so threshold 0 emits
    // exactly the candidate pair set — which must be per-copy isomorphic.
    // (Thresholded SCORES legitimately drift with k: idf = ln(kN/df)
    // re-weights every term, so the law is on pair keys, not scores.)
    val t1 = graft.text.SparseSim.tfidfCosinePairs(d1, "doc_id", "text",
      threshold = 0.0).count()
    val t4 = graft.text.SparseSim.tfidfCosinePairs(d4, "doc_id", "text",
      threshold = 0.0).count()
    assert(t4 == k * t1, s"tfidf pairs: expected ${k * t1}, got $t4 (t1=$t1)")
    spark.catalog.clearCache()
  }

  test("label propagation growth law: copies converge to offset-replicated labels") {
    val k = 3
    val e1 = ScaledFixtures.scaledEdges(spark, sfDir, 1, s"$tmpBase/lp-edges1")
    val ek = ScaledFixtures.scaledEdges(spark, sfDir, k, s"$tmpBase/lp-edges$k")
    val base = graft.graphs.LabelProp.run(e1, rounds = 3, broadcastLabels = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val grown = graft.graphs.LabelProp.run(ek, rounds = 3, broadcastLabels = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(grown.length == k * base.size)
    // votes never cross disjoint components, so copy cp's labels are the
    // base labels shifted by its id offset — bit-for-bit
    grown.foreach { case (node, lab) =>
      val off = (node / 10000000L) * 10000000L
      assert(lab == base(node - off) + off, s"node $node lab $lab off $off")
    }
    spark.catalog.clearCache()
  }

  test("k-core growth law: copies peel to offset-replicated cores") {
    val k = 3
    val e1 = ScaledFixtures.scaledEdges(spark, sfDir, 1, s"$tmpBase/kc-edges1")
    val ek = ScaledFixtures.scaledEdges(spark, sfDir, k, s"$tmpBase/kc-edges$k")
    val base = graft.graphs.KCore.run(e1, k = 60, rounds = 3,
        broadcastActive = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(base.nonEmpty, "base 60-core empty — law is vacuous")
    val grown = graft.graphs.KCore.run(ek, k = 60, rounds = 3,
        broadcastActive = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(grown.length == k * base.size)
    // peeling never crosses disjoint components: copy cp's core is the
    // base core shifted by its offset, with IDENTICAL core degrees
    grown.foreach { case (node, deg) =>
      val off = (node / 10000000L) * 10000000L
      assert(base(node - off) == deg, s"node $node deg $deg off $off")
    }
    spark.catalog.clearCache()
  }

  test("BFS growth law: replicated seeds give offset-replicated hops") {
    val k = 3
    val e1 = ScaledFixtures.scaledEdges(spark, sfDir, 1, s"$tmpBase/bfs-edges1")
    val ek = ScaledFixtures.scaledEdges(spark, sfDir, k, s"$tmpBase/bfs-edges$k")
    val s1 = e1.selectExpr("src AS node").where("node % 10000000 < 50").distinct()
    val sk = ek.selectExpr("src AS node").where("node % 10000000 < 50").distinct()
    val base = graft.graphs.Bfs.run(e1, s1, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(base.nonEmpty, "base reach empty — law is vacuous")
    val grown = graft.graphs.Bfs.run(ek, sk, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(grown.length == k * base.size)
    grown.foreach { case (node, hops) =>
      val off = (node / 10000000L) * 10000000L
      assert(base(node - off) == hops, s"node $node hops $hops off $off")
    }
    spark.catalog.clearCache()
  }

  test("hyperball growth law: node rows scale exactly xk, sketch mass within " +
    "HLL tolerance of xk") {
    val k = 3
    val e1 = ScaledFixtures.scaledEdges(spark, sfDir, 1, s"$tmpBase/hb-edges1")
    val ek = ScaledFixtures.scaledEdges(spark, sfDir, k, s"$tmpBase/hb-edges$k")
    val b = graft.graphs.HyperBall.neighborhoodSizes(e1, rounds = 2)
      .agg(count(lit(1)), sum(col("est_reachable"))).head()
    val g = graft.graphs.HyperBall.neighborhoodSizes(ek, rounds = 2)
      .agg(count(lit(1)), sum(col("est_reachable"))).head()
    // components are disjoint, so the node universe scales exactly xk
    assert(g.getLong(0) == k * b.getLong(0), s"hyperball nodes: $b vs $g")
    // estimates are NOT offset-replicated (registers hash node IDS, and
    // each copy's ids differ). Per-copy errors are also strongly
    // CORRELATED across nodes (balls overlap, all nodes share the hash
    // functions), so the summed mass carries the per-copy HLL sigma
    // (~26% at p=4) damped only by sqrt(k) — the observed fixture ratio
    // is 1.18, deterministic. The law worth pinning: ratio stays in the
    // estimator-noise band, nowhere near the ratio≈k (=3) a
    // balls-crossing-copies bug would produce.
    val ratio = g.getLong(1).toDouble / (k.toDouble * b.getLong(1))
    assert(ratio > 0.6 && ratio < 1.5, s"hyperball mass ratio $ratio")
    spark.catalog.clearCache()
  }

  test("bucketed join growth law: join rows scale exactly xk and the plan " +
    "stays exchange-free at every k") {
    val e1 = ScaledFixtures.scaledEdges(spark, sfDir, 1, s"$tmpBase/bkt-edges1")
    val e3 = ScaledFixtures.scaledEdges(spark, sfDir, 3, s"$tmpBase/bkt-edges3")
    def joined(k: Int, e: org.apache.spark.sql.DataFrame) = {
      val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      graft.lake.Bucketing.writeBucketed(e, s"scale_bkt_e$k",
        s"$tmpBase/bktA$k", "src", 8)
      graft.lake.Bucketing.writeBucketed(deg, s"scale_bkt_d$k",
        s"$tmpBase/bktB$k", "src", 8)
      graft.lake.Bucketing.bucketedJoin(spark,
        s"scale_bkt_e$k", s"scale_bkt_d$k", "src")
    }
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // broadcast off: the contract is shuffle-freedom from LAYOUT, not
      // from the tiny fixture fitting in a broadcast (BucketingSpec's
      // posture)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j1 = joined(1, e1); val j3 = joined(3, e3)
      // each edge row matches exactly its src's one degree row, and
      // copies are disjoint: join cardinality scales exactly xk
      val n1 = j1.count(); val n3 = j3.count()
      assert(n1 == e1.count() && n3 == 3L * n1,
        s"bucketed join rows: $n1 -> $n3")
      // co-location is a LAYOUT property, so the exchange-free plan must
      // be scale-independent — the one-time clustering write, amortized
      // over every later join, is the whole point at 100 TB
      Seq(1 -> j1, 3 -> j3).foreach { case (k, j) =>
        val plan = j.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"bucketed join at x$k plans an exchange:\n$plan")
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      Seq(1, 3).foreach { k =>
        spark.sql(s"DROP TABLE IF EXISTS scale_bkt_e$k")
        spark.sql(s"DROP TABLE IF EXISTS scale_bkt_d$k")
      }
    }
    spark.catalog.clearCache()
  }

  test("SCC growth law: copies resolve to offset-replicated components") {
    val k = 3
    val e1 = ScaledFixtures.scaledEdges(spark, sfDir, 1, s"$tmpBase/scc-edges1")
    val ek = ScaledFixtures.scaledEdges(spark, sfDir, k, s"$tmpBase/scc-edges$k")
    // SCC labels are STRUCTURAL (min member id), so unlike the
    // hash-dependent HyperBall estimates they are exactly
    // offset-equivariant on disjoint copies.
    val base = graft.graphs.Scc.run(e1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val grown = graft.graphs.Scc.run(ek).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(grown.length == k * base.size)
    grown.foreach { case (node, scc) =>
      val off = (node / 10000000L) * 10000000L
      assert(scc == base(node - off) + off, s"node $node scc $scc off $off")
    }
    spark.catalog.clearCache()
  }

  test("no plan degradation at 20x: no cartesian product, no global sort") {
    val d20 = docsAt(20)
    val e20 = ScaledFixtures.scaledEmbeddings(spark, sfDir, 20, s"$tmpBase/emb20")
    val n20 = ScaledFixtures.scaledNames(spark, sfDir, 20, s"$tmpBase/names20")
    val plans = Seq(
      "minhash-lsh" -> TextDedup.nearDupPairs(d20, "doc_id", "text"),
      "prefix-jaccard" -> TextDedup.jaccardNearDupPairsPrefix(
        d20, "doc_id", "text", shingleN = 2, threshold = 0.5),
      "fuzzy" -> graft.text.Fuzzy.editDistancePairs(n20, "c_custkey", "c_name"),
      "embedding-canonical" -> graft.ml.Similarity.keepCanonical(e20, 0.3),
      "tfidf-cosine" -> graft.text.SparseSim.tfidfCosinePairs(
        d20, "doc_id", "text"))
    plans.foreach { case (name, df) =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name degraded to CartesianProduct at 20x:\n$plan")
      assert(!plan.contains("rangepartitioning"),
        s"$name introduced a global sort at 20x:\n$plan")
    }
    spark.catalog.clearCache()
  }
}
