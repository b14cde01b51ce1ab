package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank-fusion retrieval primitives — combining lexical (BM25) and dense
  * (embedding-cosine) rankings is how hybrid search ships: each ranker is
  * good at what the other misses, and fusing by RANK rather than score
  * sidesteps incomparable score scales entirely.
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    * fused(d) = Σ_lists 1 / (rrfK + rank_list(d)), the de-facto standard
    * hybrid-retrieval combiner (rrfK = 60 in the paper).
    *
    * Cross-engine determinism: each reciprocal is the EXACT integer
    * 2³⁰ div (rrfK + rank) — a fixed-point quantize-once term — and the
    * fused score is a long sum, order-independent under any partitioning
    * (no float fold to pin down). Callers supply 1-based `rank` columns
    * produced by a deterministic ordering (unique tiebreakers upstream).
    *
    * Scale posture: inputs are already top-N ranked lists (N-sized, not
    * corpus-sized); the fuse is one union + one map-side-combinable sum +
    * a TakeOrdered — driver cost is k rows.
    *
    * Output: (id, n_lists, rrf_score_fp) — top `k` by score, id-asc ties.
    */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, k: Int,
              rrfK: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(k > 0 && rrfK >= 0, s"rrfFuse: bad k=$k / rrfK=$rrfK")
    val scored = lists
      .map(_.select(col(idCol).as("id"),
        expr(s"CAST(1073741824 AS BIGINT) div ($rrfK + rank)").as("__s")))
      .reduce(_ unionByName _)
    scored.groupBy(col("id"))
      .agg(count(lit(1)).as("n_lists"), sum(col("__s")).as("rrf_score_fp"))
      .orderBy(col("rrf_score_fp").desc, col("id").asc)
      .limit(k)
  }
}
