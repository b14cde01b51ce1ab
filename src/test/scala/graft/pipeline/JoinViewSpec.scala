package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Delta-rule join-view maintenance: folded deltas must equal the full
  * recompute with MULTISET semantics, whatever the batch slicing.
  */
class JoinViewSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("k")

  test("fold of misaligned batch pairs equals the one-shot join, multiset-exact") {
    // duplicate join keys on both sides so multiplicity is exercised
    val a = Seq((1L, "a1"), (1L, "a2"), (2L, "a3"), (3L, "a4"), (4L, "a5"))
      .toDF("k", "av")
    val b = Seq((1L, "b1"), (2L, "b2"), (2L, "b3"), (3L, "b4"), (9L, "b5"))
      .toDF("k", "bv")
    def slice(df: org.apache.spark.sql.DataFrame, i: Int) =
      df.filter(pmod(col("k"), lit(3)) === i)
    // a's batch i arrives with b's batch (i+1)%3: every cross term
    // (ΔA⋈ΔB, ΔA⋈B_old, A_old⋈ΔB) gets exercised across the fold
    val st0 = JoinView.init(slice(a, 0), slice(b, 1), keys)
    val st1 = JoinView.advance(st0, slice(a, 1), slice(b, 2), keys)
    val st2 = JoinView.advance(st1, slice(a, 2), slice(b, 0), keys)
    val oneShot = a.join(b, keys)
    assert(st2.view.exceptAll(oneShot).isEmpty &&
      oneShot.exceptAll(st2.view).isEmpty,
      "folded view diverged from the one-shot join")
    assert(st2.view.count() == oneShot.count())
  }

  test("empty deltas are no-ops; accumulated sides stay complete") {
    val a = Seq((1L, "x")).toDF("k", "av")
    val b = Seq((1L, "y"), (2L, "z")).toDF("k", "bv")
    val empty = a.filter(lit(false))
    val emptyB = b.filter(lit(false))
    val st = JoinView.advance(JoinView.init(a, b, keys), empty, emptyB, keys)
    assert(st.view.count() == 1L)
    assert(st.a.count() == 1L && st.b.count() == 2L)
  }
}
