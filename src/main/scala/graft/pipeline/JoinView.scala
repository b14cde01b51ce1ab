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
}
