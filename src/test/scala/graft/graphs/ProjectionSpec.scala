package graft.graphs

import graft.SparkSpec

class ProjectionSpec extends SparkSpec {

  test("bipartiteProject: shared-left weights, canonical direction, cap") {
    val s = spark; import s.implicits._
    // baskets: o1 {1,2,3}, o2 {1,2}, o3 {2,3}, hot {1..5} (degree 5)
    val inc = (Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 1L), (20L, 2L),
      (30L, 2L), (30L, 3L)) ++ (1L to 5L).map(r => (99L, r)))
      .toDF("l", "r")
    val got = Projection.bipartiteProject(inc, "l", "r")
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2))
      .toMap
    // (1,2): o1,o2,hot = 3; (2,3): o1,o3,hot = 3; (1,3): o1,hot = 2
    assert(got((1L, 2L)) == 3L && got((2L, 3L)) == 3L && got((1L, 3L)) == 2L)
    assert(got((4L, 5L)) == 1L) // hot basket only
    assert(got.keys.forall { case (a, b) => a < b })
    // degree cap 4 drops the hot basket entirely
    val capped = Projection.bipartiteProject(inc, "l", "r",
        maxDegree = Some(4))
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2))
      .toMap
    assert(capped((1L, 2L)) == 2L && !capped.contains((4L, 5L)))
    // minShared filters
    val strong = Projection.bipartiteProject(inc, "l", "r", minShared = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(strong == Set((1L, 2L), (2L, 3L)))
  }

  test("degreeProfile: the pair fan-out forecast is exact") {
    val s = spark; import s.implicits._
    val inc = (Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 1L)) ++
      (1L to 5L).map(r => (99L, r))).toDF("l", "r")
    val p = Projection.degreeProfile(inc, "l", "r").head()
    // degrees: 3, 1, 5 → pairs 3 + 0 + 10 = 13
    assert((p.getLong(0), p.getLong(1), p.getLong(2), p.getLong(3)) ==
      ((3L, 9L, 5L, 13L)))
    // the forecast equals what the projection actually emits (with
    // multiplicity: sum of n_shared = total pairs)
    val emitted = Projection.bipartiteProject(inc, "l", "r")
      .agg(org.apache.spark.sql.functions.sum("n_shared")).head().getLong(0)
    assert(emitted == 13L)
  }
}
