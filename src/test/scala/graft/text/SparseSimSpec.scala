package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TF-IDF cosine pairs and source-overlap: hand-computed fixed-point
  * weights, equivalence to the unguarded formulation, the maxDf
  * lower-bound contract, and plan shape (no CartesianProduct).
  */
class SparseSimSpec extends SparkSpec {
  import spark.implicits._

  // Mirror of the operator's quantization: wq = floor((1+ln tf)·ln(N/df)·10³)
  private def wq(tf: Long, n: Long, df: Long): Long =
    math.floor((1.0 + math.log(tf.toDouble))
      * math.log(n.toDouble / df.toDouble) * 1000.0).toLong

  test("tfidfCosinePairs: hand-computed 3-gram weights, dot, and cosine") {
    // Doc 1's trigram multiset: {a b c ×2, b c a, c a b}; doc 2 shares
    // only "a b c" (df=2); doc 3 shares nothing; doc 4 is too short for
    // any trigram and must not count toward N.
    val docs = Seq(
      (1L, "a b c a b c"),
      (2L, "a b c x y z"),
      (3L, "p q r s"),
      (4L, "too short")).toDF("doc_id", "text")
    val got = SparseSim.tfidfCosinePairs(docs, "doc_id", "text", threshold = 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet == Set((1L, 2L)))
    val n = 3L // docs with at least one trigram
    val dot = wq(2, n, 2) * wq(1, n, 2) // shared term "a b c"
    val n1 = math.sqrt((wq(2, n, 2) * wq(2, n, 2)
      + 2 * wq(1, n, 1) * wq(1, n, 1)).toDouble) // b c a, c a b
    val n2 = math.sqrt((wq(1, n, 2) * wq(1, n, 2)
      + 3 * wq(1, n, 1) * wq(1, n, 1)).toDouble) // b c x, c x y, x y z
    val (nShared, gotDot, cos) = got((1L, 2L))
    assert(nShared == 1L)
    assert(gotDot == dot)
    assert(cos == dot.toDouble / (n1 * n2))
  }

  test("tfidfCosinePairs: equals the unguarded plain-join formulation on real docs") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val gotDf = SparseSim.tfidfCosinePairs(docs, "doc_id", "text",
      threshold = 0.3, cap = 4) // tiny cap: force triangle cells
    val got = gotDf.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    // Reference: same weighting, explicitly-renamed plain self-join (an
    // aliased self-join of the same derived frame misresolves a.id/b.id).
    val tf = docs.select(col("doc_id").cast("long").as("id"),
        explode(TextDedup.shinglesAll(col("text"), 3)).as("w"))
      .groupBy("id", "w").agg(count(lit(1)).as("tf"))
    val n = tf.select("id").distinct().count()
    val dfT = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val wt = tf.join(dfT, "w").filter(col("df") < n)
      .select(col("id"), col("w"),
        floor((lit(1.0) + log(col("tf").cast("double")))
          * log(lit(n.toDouble) / col("df").cast("double"))
          * lit(1000.0)).as("wq"))
    val norms = wt.groupBy("id").agg(sum(col("wq") * col("wq")).as("nq"))
    val expected = wt.select(col("id").as("ida"), col("w"), col("wq").as("wqa"))
      .join(wt.select(col("id").as("idb"), col("w"), col("wq").as("wqb")), "w")
      .filter(col("ida") < col("idb"))
      .groupBy(col("ida").as("doc_a"), col("idb").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"), sum(col("wqa") * col("wqb")).as("dot"))
      .join(norms.select(col("id").as("doc_a"), col("nq").as("na")), "doc_a")
      .join(norms.select(col("id").as("doc_b"), col("nq").as("nb")), "doc_b")
      .filter(col("dot").cast("double")
        / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))) >= 0.3)
      // each using-join hoists its key to column 0 — re-fix the order
      // before positional reads
      .select(col("doc_a"), col("doc_b"), col("n_shared"), col("dot"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expected)
    assert(got.nonEmpty) // the corpus really exercises the pair path
    val plan = gotDf.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("tfidfCosinePairs: maxDf pairs are a subset with lower-bound cosines") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val exact = SparseSim.tfidfCosinePairs(docs, "doc_id", "text", threshold = 0.2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(4))).toMap
    val pruned = SparseSim.tfidfCosinePairs(docs, "doc_id", "text",
        threshold = 0.2, maxDf = Some(3))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(4))).toMap
    assert(pruned.keySet.subsetOf(exact.keySet))
    pruned.foreach { case (k, c) => assert(c <= exact(k) + 1e-12, s"$k") }
  }

  test("sourceOverlap: hand-computed intersection, jaccard, overlap") {
    // srcA 3-gram set: {a b c, b c d} (from "a b c d"); srcB: {b c d, c d e};
    // srcC shares nothing. Intersection(A,B) = {b c d} → J = 1/3, ov = 1/2.
    val docs = Seq(
      ("A", "a b c d"), ("B", "b c d e"), ("C", "x y z w")
    ).toDF("source", "text")
    val got = SparseSim.sourceOverlap(docs, "source", "text")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    assert(got.keySet == Set(("A", "B")))
    assert(got(("A", "B")) == ((1L, 2L, 2L, 1.0 / 3.0, 0.5)))
  }

  test("sourceOverlap: within-source duplicate shingles count once") {
    val docs = Seq(
      ("A", "p q r"), ("A", "p q r"), // same shingle twice in A
      ("B", "p q r s")).toDF("source", "text")
    val row = SparseSim.sourceOverlap(docs, "source", "text").collect()
    assert(row.length == 1)
    val r = row.head
    // A = {p q r} (n=1), B = {p q r, q r s} (n=2), inter = 1
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((1L, 1L, 2L)))
  }

  test("minhashSourceSimilarity: identical sources agree on every hash") {
    val s = spark; import s.implicits._
    val docs = Seq(("A", 0L, "x y z w v u t"), ("B", 1L, "x y z w v u t"),
      ("C", 2L, "completely different words here now"))
      .toDF("source", "doc_id", "text")
    val out = SparseSim.minhashSourceSimilarity(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(out(("A", "B")) == ((64L, 1000000L))) // identical shingle sets
    assert(out(("A", "C"))._1 == 0L) // disjoint sets: no shared min
    assert(out.size == 3)
  }

  test("minhashSourceSimilarity: estimate tracks exact jaccard within band") {
    val s = spark; import s.implicits._
    // Two sources sharing roughly half their shingles: A covers tokens
    // 0..59, B covers 30..89 — overlapping token streams.
    def doc(lo: Int, hi: Int) = (lo until hi).map(i => s"w$i").mkString(" ")
    val docs = Seq(("A", 0L, doc(0, 60)), ("B", 1L, doc(30, 90)))
      .toDF("source", "doc_id", "text")
    val est = SparseSim.minhashSourceSimilarity(docs, "source", "text",
      numHashes = 128).head().getLong(3) / 1e6
    val exact = SparseSim.sourceOverlap(docs, "source", "text")
      .head().getDouble(5)
    // J = 28/(58+58-28) = 0.318; sd at H=128 ~ 0.04 → assert 4 sigma
    assert(math.abs(est - exact) < 0.17, s"est $est vs exact $exact")
    spark.catalog.clearCache()
  }
}
