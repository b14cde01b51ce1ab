package graft.text

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Near-dup/exact dedup + text fingerprints: correctness on planted
  * duplicates and plan-level scale assertions (no all-pairs joins).
  */
class TextDedupSpec extends SparkSpec {

  private def syntheticDocs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      // near-dup of 1: one token changed
      (2L, "the quick brown fox jumps over the lazy cat again and again today"),
      (3L, "completely different text about spark shuffles and partitions here now"),
      // exact dup of 3 (whitespace/case normalized away)
      (4L, "  Completely different text about spark shuffles and partitions here now "),
      (5L, "unrelated fifth document with its own words entirely disjoint tokens"),
    ).toDF("doc_id", "text")
  }

  test("nearDupPairs finds the planted near-dup and nothing else") {
    val pairs = TextDedup.nearDupPairs(syntheticDocs, "doc_id", "text",
      shingleN = 3, numBands = 16, rowsPerBand = 4, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"missing planted near-dup in $pairs")
    assert(!pairs.contains((1L, 5L)) && !pairs.contains((2L, 5L)))
  }

  test("nearDupPairs plan has no CartesianProduct (LSH-bucketed, not all-pairs)") {
    val plan = TextDedup.nearDupPairs(Tables.documents(spark, sfDir), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"all-pairs join in plan:\n$plan")
  }

  test("nearDupPairs on driver documents verifies candidates with exact Jaccard") {
    val pairs = TextDedup.nearDupPairs(Tables.documents(spark, sfDir), "doc_id", "text")
    assert(pairs.filter(col("jaccard") < 0.8 || col("jaccard") > 1.0).count() == 0)
    assert(pairs.filter(col("doc_a") >= col("doc_b")).count() == 0)
  }

  test("contaminationScores counts exactly the shingles shared with the probe set") {
    val s = spark; import s.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // 4 trigram shingles
      (2L, "totally disjoint words nothing here"),
      (3L, "xx yy")).toDF("doc_id", "text") // < 3 tokens → 0 shingles
    val probe = Seq(
      (100L, "beta gamma delta epsilon other tail")).toDF("doc_id", "text")
    val out = TextDedup.contaminationScores(corpus, probe, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    // doc 1 shares "beta gamma delta" and "gamma delta epsilon"
    assert(out == Map(1L -> ((4, 2L)), 2L -> ((3, 0L)), 3L -> ((0, 0L))))
  }

  test("contaminationScores plan joins on shingle hash, never all-pairs") {
    val docs = Tables.documents(spark, sfDir)
    val plan = TextDedup.contaminationScores(
        docs.filter(col("doc_id") % 5 =!= 0), docs.filter(col("doc_id") % 5 === 0),
        "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), s"all-pairs join in plan:\n$plan")
  }

  test("exact dedup keeps the min-id copy of normalized-identical texts") {
    val kept = TextDedup.dropDuplicateContent(syntheticDocs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L, 5L))
    val summary = TextDedup.exactDedupSummary(syntheticDocs, "doc_id", "text")
    assert(summary.filter(col("n_copies") === 2).count() == 1)
  }

  test("simhash: near-dups are close in Hamming distance, unrelated docs far") {
    val sh = TextDedup.simhash(syntheticDocs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sh(3L) == sh(3L))
    assert(hamming(sh(1L), sh(2L)) < hamming(sh(1L), sh(5L)),
      s"near-dup ${hamming(sh(1L), sh(2L))} !< unrelated ${hamming(sh(1L), sh(5L))}")
  }

  test("fingerprint is order-sensitive and stable") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta gamma"), (2L, "beta alpha gamma"),
      (3L, "alpha beta gamma")).toDF("doc_id", "text")
    val fp = TextDedup.fingerprint(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(3L), "identical text must fingerprint identically")
    assert(fp(1L) != fp(2L), "token swap must change the fingerprint")
  }

  test("shingles are distinct 1-based n-grams; short docs yield empty sets") {
    import spark.implicits._
    val df = Seq(Tuple1("a b c d"), Tuple1("x y")).toDF("text")
      .select(TextDedup.shingles(col("text"), 3).as("sh"))
    val rows = df.collect().map(_.getSeq[String](0).toSet)
    assert(rows(0) == Set("a b c", "b c d"))
    assert(rows(1) == Set.empty)
  }
}
