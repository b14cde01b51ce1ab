package graft.graphs

import graft.SparkSpec

class KCoreSpec extends SparkSpec {

  /** Symmetrized edge list from undirected pairs. */
  private def undirected(pairs: Seq[(Long, Long)]) = {
    val s = spark; import s.implicits._
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
  }

  test("cascading peel: tail drops first round, its anchor the next") {
    // triangle 1-2-3 (the 2-core) + path 3-4-5: round 1 peels 5? no —
    // deg(5)=1 <2 and deg(4)=2 → round 1 drops 5, round 2 drops 4
    // (its surviving degree fell to 1), triangle is the fixpoint.
    val edges = undirected(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)))
    val got = KCore.run(edges, k = 2, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("fixpoint: extra rounds are identity; k above max degree empties") {
    val edges = undirected(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)))
    val at4 = KCore.run(edges, k = 2, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val at8 = KCore.run(edges, k = 2, rounds = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(at4 == at8)
    assert(KCore.run(edges, k = 5, rounds = 3).count() == 0)
  }

  test("broadcastActive ≡ shuffle semi-joins on two fused cliques") {
    // two 4-cliques sharing node 10 via single bridges: bridges peel at
    // k=3, cliques (internal degree 3) survive.
    val k4a = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val k4b = for (a <- 5L to 8L; b <- 5L to 8L if a < b) yield (a, b)
    val edges = undirected(k4a ++ k4b ++ Seq((4L, 10L), (10L, 5L)))
    val bc = KCore.run(edges, k = 3, rounds = 5, broadcastActive = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = KCore.run(edges, k = 3, rounds = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bc == sh)
    assert(bc.map(_._1) == (1L to 8L).toSet)
    assert(bc.forall(_._2 == 3L))
  }
}
