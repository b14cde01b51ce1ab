package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Incremental JOIN-view maintenance — the delta rule for materialized
  * equi-join views (classic incremental view maintenance, e.g.
  * Gupta/Mumick's change-propagation formulation; public literature):
  * with V = A ⋈ B materialized and append-only deltas ΔA/ΔB arriving,
  *
  *   V' = V ∪ (ΔA ⋈ (B ∪ ΔB)) ∪ (A ⋈ ΔB)
  *
  * — the ΔA⋈ΔB cross term lands exactly once (inside the first term,
  * absent from the second), so the refreshed view is row-for-row the
  * full recompute (A∪ΔA) ⋈ (B∪ΔB) with MULTISET semantics, while the
  * per-batch work is delta-sized joins only. This is [[Medallion.mergeAggState]]'s
  * sibling for JOIN views: the rollup that never rescans either side's
  * history (q249 gates fold ≡ one-shot).
  *
  * Scale posture: each refresh joins a batch-sized delta against the
  * accumulated other side — Spark broadcasts the delta side when small
  * (the common case), and the accumulated sides/view are append-only
  * unions a caller would persist as tables between runs. Nothing ever
  * recomputes A ⋈ B.
  */
object JoinView {

  /** Materialized state: both accumulated sides plus the view. */
  final case class State(a: DataFrame, b: DataFrame, view: DataFrame)

  /** Initialize from the first pair of batches. */
  def init(a0: DataFrame, b0: DataFrame, keys: Seq[String]): State = {
    require(keys.nonEmpty, "JoinView needs join keys")
    State(a0, b0, a0.join(b0, keys))
  }

  /** Fold one append-only batch pair into the state (either delta may
    * be empty). The returned view is provably the full join of the
    * accumulated sides; only delta-sized joins run.
    */
  def advance(st: State, dA: DataFrame, dB: DataFrame,
              keys: Seq[String]): State = {
    require(keys.nonEmpty, "JoinView needs join keys")
    val bNew = st.b.unionByName(dB)
    val view = st.view
      .unionByName(dA.join(bNew, keys))
      .unionByName(st.a.join(dB, keys))
    State(st.a.unionByName(dA), bNew, view)
  }

  /** DURABLE, exactly-once refresh — the production shape of
    * [[advance]]: state lives as three flat Delta tables under `dir`
    * (`a`, `b`, `view`), each append guarded by the Delta protocol's
    * txn watermark keyed on `batchId` (the
    * [[graft.streaming.SilverStream]] sink mechanism), so a crash at
    * ANY point and a replay of the same (dA, dB, batchId) — the
    * foreachBatch redelivery contract — converges to the same view a
    * single clean run produces:
    *
    *  1. dA appends to `a` (skipped if this batchId already landed);
    *  2. dB appends to `b` (ditto);
    *  3. the delta-rule view increment ΔA ⋈ (B∪ΔB) ∪ A_before ⋈ ΔB
    *     appends to `view` (ditto) — A_before is time-traveled to just
    *     below the `a`-commit CARRYING this batchId, so step 3 replayed
    *     after a crash between 1 and 3 still joins against the
    *     pre-batch A even though `a` has already advanced.
    *
    * Returns the refreshed view (reading the `view` table). `batchId`s
    * must be strictly increasing across refreshes (watermark
    * semantics). Each refresh runs delta-sized joins only; no history
    * rescan, ever.
    */
  def refreshDurable(spark: org.apache.spark.sql.SparkSession, dir: String,
                     dA: DataFrame, dB: DataFrame, keys: Seq[String],
                     batchId: Long): DataFrame = {
    require(keys.nonEmpty, "JoinView needs join keys")
    import graft.lake.DeltaLog
    val (aRoot, bRoot, vRoot) = (s"$dir/a", s"$dir/b", s"$dir/view")
    // steps 1 and 2 land on DIFFERENT tables from DIFFERENT inputs —
    // run them as concurrent commits so their write jobs overlap (the
    // DML side-job pattern); step 3 needs both, so it joins after.
    // Replay safety is unchanged: each commit is guarded by its own
    // table's txn watermark.
    val aFut = scala.concurrent.Future {
      DeltaLog.commitFlat(spark, aRoot, dA, txn = Some((AppA, batchId)))
    }(DeltaLog.sideJobEc)
    DeltaLog.commitFlat(spark, bRoot, dB, txn = Some((AppB, batchId)))
    scala.concurrent.Await.result(aFut,
      scala.concurrent.duration.Duration.Inf)
    val aCommit = DeltaLog.txnCommitVersion(aRoot, AppA, batchId)
      .getOrElse(throw new IllegalStateException(
        s"JoinView: no $aRoot commit carries batch $batchId"))
    val aBefore =
      if (aCommit == 0L) dA.limit(0)
      else DeltaLog.readAt(spark, aRoot, aCommit - 1)
    val bAfter = DeltaLog.read(spark, bRoot)
    val increment = dA.join(bAfter, keys)
      .unionByName(aBefore.join(dB, keys))
    DeltaLog.commitFlat(spark, vRoot, increment,
      txn = Some((AppView, batchId)))
    DeltaLog.read(spark, vRoot)
  }

  private val AppA = "graft-joinview-a"
  private val AppB = "graft-joinview-b"
  private val AppView = "graft-joinview-view"
}
