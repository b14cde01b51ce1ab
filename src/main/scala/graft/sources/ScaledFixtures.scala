package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic corpus GROWTH for scale-stress testing — the 20–50× inputs
  * ScaleSpec and [[graft.ScaleProbe]] measure the dedup/similarity
  * family against.
  *
  * The scaling model is growth, not replication: each of the k copies
  * gets every token suffixed with a copy tag, so copies have DISJOINT
  * token/shingle universes — intra-copy duplicate structure is
  * preserved copy-for-copy while cross-copy near-duplicates cannot
  * exist. Candidate volume and true-pair output of a well-behaved
  * operator must therefore grow ~linearly in k (each copy contributes
  * its own share), which is exactly the assertable contract; naive
  * replication would instead grow true output quadratically and prove
  * nothing about the operator.
  *
  * The copy tag is two repeated letters (`_aa`, `_bb`, …) so cross-copy
  * token pairs differ by ≥ 2 edits — the fuzzy-join (d ≤ 1) scaling
  * keeps its cross-copy independence too.
  *
  * Fixtures are WRITTEN to parquet and read back: downstream plan
  * assertions and timings then see a clean file scan, not the fixture's
  * construction plan.
  */
object ScaledFixtures {

  private def tag(cp: Int): String = {
    require(cp >= 0 && cp < 52, s"copy index in [0, 52), got $cp")
    val c = ('a' + cp % 26).toChar
    // the second-alphabet suffix must be two chars: "aa" vs "aaq" would
    // be edit distance 1 and leak cross-copy fuzzy matches at d <= 1
    val hi = if (cp >= 26) "qq" else ""
    s"$c$c$hi"
  }

  /** k disjoint-universe copies of the documents table, written to
    * `out` (doc ids offset by 10⁷ per copy, every token suffixed with
    * the copy tag).
    */
  def scaledDocs(spark: SparkSession, dir: String, k: Int,
                 out: String): DataFrame = {
    require(k >= 1, s"scaledDocs: k >= 1, got $k")
    val copies = (0 until k).map { cp =>
      Tables.documents(spark, dir).select(
        (col("doc_id") + lit(cp * 10000000L)).as("doc_id"),
        expr(s"concat_ws(' ', transform(split(text, ' '), " +
          s"t -> concat(t, '_${tag(cp)}')))").as("text"),
        col("lang"), col("source"), col("n_chars"))
    }
    copies.reduce(_.unionByName(_))
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode(SaveMode.Overwrite).parquet(out)
    spark.read.parquet(out)
  }

  /** m exact copies of one boilerplate text under distinct ids — the
    * degenerate band bucket extra hashing can never split (identical
    * content re-buckets together forever). The hot-bucket guard's
    * worst case.
    */
  def megaClusterDocs(spark: SparkSession, m: Int, startId: Long): DataFrame =
    spark.range(m.toLong).select(
      (col("id") + lit(startId)).as("doc_id"),
      lit("standard mandatory legal boilerplate notice appended verbatim " +
        "to every document in this synthetic corpus shard").as("text"),
      lit("en").as("lang"), lit("synthetic").as("source"),
      lit(110L).as("n_chars"))

  /** k copies of the embeddings table with each copy's vectors ROTATED
    * by the copy index (cyclic shift of components): rotation preserves
    * norms and intra-copy cosine structure exactly while decorrelating
    * copies, so sign-LSH candidate structure repeats per copy instead
    * of piling every copy into the same buckets.
    */
  def scaledEmbeddings(spark: SparkSession, dir: String, k: Int,
                       out: String): DataFrame = {
    require(k >= 1, s"scaledEmbeddings: k >= 1, got $k")
    val copies = (0 until k).map { cp =>
      val s = cp.toString
      Tables.embeddings(spark, dir).select(
        (col("vec_id") + lit(cp * 10000000L)).as("vec_id"),
        expr(s"concat(slice(embedding, $s % size(embedding) + 1, " +
          s"size(embedding) - $s % size(embedding)), " +
          s"slice(embedding, 1, $s % size(embedding)))").as("embedding"),
        col("label"))
    }
    copies.reduce(_.unionByName(_))
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode(SaveMode.Overwrite).parquet(out)
    spark.read.parquet(out)
  }

  /** k disjoint copies of the item co-occurrence edge list (q94/q101's
    * graph: parts sharing an order, both directions), node ids offset
    * by 10⁷ per copy — k independent components with identical
    * structure, so triangle counts and fixed-point PageRank mass must
    * scale exactly ×k. The base edge list is built once and the copies
    * are written to `out`.
    */
  def scaledEdges(spark: SparkSession, dir: String, k: Int,
                  out: String): DataFrame = {
    require(k >= 1, s"scaledEdges: k >= 1, got $k")
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
    val base = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
    (0 until k).map { cp =>
      base.select((col("src") + lit(cp * 10000000L)).as("src"),
        (col("dst") + lit(cp * 10000000L)).as("dst"))
    }.reduce(_.unionByName(_))
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode(SaveMode.Overwrite).parquet(out)
    spark.read.parquet(out)
  }

  /** k disjoint-universe copies of customer names for the fuzzy join
    * (ids offset, names suffixed with the ≥2-edit copy tag).
    */
  def scaledNames(spark: SparkSession, dir: String, k: Int,
                  out: String): DataFrame = {
    require(k >= 1, s"scaledNames: k >= 1, got $k")
    val copies = (0 until k).map { cp =>
      Tables.customer(spark, dir).select(
        (col("c_custkey") + lit(cp * 10000000L)).as("c_custkey"),
        concat(col("c_name"), lit(s"_${tag(cp)}")).as("c_name"))
    }
    copies.reduce(_.unionByName(_))
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode(SaveMode.Overwrite).parquet(out)
    spark.read.parquet(out)
  }
}
