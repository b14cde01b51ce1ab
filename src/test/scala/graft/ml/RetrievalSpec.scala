package graft.ml

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {

  private def fp(rank: Int, rrfK: Int = 60): Long =
    (1L << 30) / (rrfK + rank)

  test("rrfFuse: exact fixed-point sums, single-list docs, k cut") {
    val s = spark; import s.implicits._
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), "id", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 20 leads (both lists), then 10 (rank 1 in a), then 40 (rank 2 in b)
    assert(got.toSeq == Seq(
      (20L, 2L, fp(2) + fp(1)),
      (10L, 1L, fp(1)),
      (40L, 1L, fp(2))))
  }

  test("rrfFuse: id tiebreak on equal scores; rrfK shifts the curve") {
    val s = spark; import s.implicits._
    val a = Seq((7L, 1), (3L, 2)).toDF("id", "rank")
    val b = Seq((3L, 1), (7L, 2)).toDF("id", "rank")
    // symmetric ranks → equal scores → ascending id order
    val ids = Retrieval.rrfFuse(Seq(a, b), "id", k = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(3L, 7L))
    val k0 = Retrieval.rrfFuse(Seq(a), "id", k = 1, rrfK = 0).head()
    assert(k0.getLong(2) == (1L << 30) / 1)
  }
}
