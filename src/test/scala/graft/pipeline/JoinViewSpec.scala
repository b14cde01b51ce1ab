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

  private def viewRows(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, String)] =
    df.select(col("k"), col("av"), col("bv")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq.sorted

  test("refreshDurable: crash between delta application and view commit, " +
    "rerun converges; replays are exactly-once; view == full recompute") {
    val a = Seq((1L, "a1"), (1L, "a2"), (2L, "a3"), (3L, "a4"), (4L, "a5"))
      .toDF("k", "av")
    val b = Seq((1L, "b1"), (2L, "b2"), (2L, "b3"), (3L, "b4"), (9L, "b5"))
      .toDF("k", "bv")
    def slice(df: org.apache.spark.sql.DataFrame, i: Int) =
      df.filter(pmod(col("k"), lit(3)) === i)
    val dir = java.nio.file.Files.createTempDirectory("graft-jv").toString
    // batch 0: clean refresh
    JoinView.refreshDurable(spark, dir, slice(a, 0), slice(b, 1), keys, 0L)
    // batch 1: CRASH WINDOW — a and b already committed, view not yet
    // (exactly the partial state a foreachBatch crash leaves behind)
    graft.lake.DeltaLog.commitFlat(spark, s"$dir/a", slice(a, 1),
      txn = Some(("graft-joinview-a", 1L)))
    graft.lake.DeltaLog.commitFlat(spark, s"$dir/b", slice(b, 2),
      txn = Some(("graft-joinview-b", 1L)))
    // redelivery of the same batch must converge, not double-apply
    JoinView.refreshDurable(spark, dir, slice(a, 1), slice(b, 2), keys, 1L)
    // batch 2 clean, then a FULL replay of batch 2 (watermark no-op)
    val v2 = JoinView.refreshDurable(spark, dir, slice(a, 2), slice(b, 0),
      keys, 2L)
    val v2replay = JoinView.refreshDurable(spark, dir, slice(a, 2),
      slice(b, 0), keys, 2L)
    val oneShot = a.join(b, keys)
    assert(viewRows(v2) == viewRows(oneShot),
      "durable view diverged from the one-shot join")
    assert(viewRows(v2replay) == viewRows(oneShot),
      "replayed batch must be exactly-once (no duplicate view rows)")
    // the sides really are tables on disk, restart-readable
    assert(graft.lake.DeltaLog.read(spark, s"$dir/a").count() == a.count())
    assert(graft.lake.DeltaLog.read(spark, s"$dir/b").count() == b.count())
  }
}
