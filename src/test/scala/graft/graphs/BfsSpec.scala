package graft.graphs

import graft.SparkSpec

class BfsSpec extends SparkSpec {

  test("chain graph: hops bounded by rounds, min over multiple seeds") {
    val s = spark; import s.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val r3 = Bfs.run(edges, seeds, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r3 == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L)) // 5 out of range
    // second seed at 5 (edges go 1→…→5 only, so 5 stays isolated as a
    // source of nothing downstream but is itself hop 0)
    val r2 = Bfs.run(edges, Seq(1L, 4L).toDF("node"), rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 0L, 5L -> 1L))
  }

  test("converged frontier: extra rounds change nothing; seed wins ties") {
    val s = spark; import s.implicits._
    // diamond 1→{2,3}→4 plus a seed already mid-graph
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    val seeds = Seq(1L, 4L).toDF("node")
    val a = Bfs.run(edges, seeds, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Bfs.run(edges, seeds, 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    assert(a == Set((1L, 0L), (2L, 1L), (3L, 1L), (4L, 0L))) // 4 stays seed-0
  }
}
