package graft.functions

import graft.SparkSpec
import graft.text.TextDedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Native gram hashing: byte-stream MD5-60 must equal the staged-HOF
  * recipe `transform(shinglesAll, tokenHash60)` value-for-value (that is
  * what every winnow/fingerprint oracle replays in DuckDB), across
  * codegen and interpreted eval, unicode, empties, and window edges.
  */
class GramHash60Spec extends SparkSpec {
  import spark.implicits._

  private val k = 3

  private def hof(rows: Seq[String], k: Int): Seq[Seq[Long]] =
    rows.zipWithIndex.toDF("text", "__i")
      .select(col("__i"),
        transform(TextDedup.shinglesAll(col("text"), k),
          g => TextDedup.tokenHash60(g)).as("h"))
      .sort("__i").collect().map(_.getSeq[Long](1)).toSeq

  private def native(rows: Seq[String], k: Int): Seq[Seq[Long]] = {
    GramHash60.register(spark)
    rows.zipWithIndex.toDF("text", "__i")
      .select(col("__i"),
        GramHash60.hashes(split(col("text"), " "), k).as("h"))
      .sort("__i").collect().map(_.getSeq[Long](1)).toSeq
  }

  private val cases = Seq(
    "a b c d e",                 // plain window slide
    "a b",                       // fewer than k tokens → empty
    "a b c",                     // exactly k → one gram
    "",                          // split("") = [""] → under k
    "a  b c d",                  // double space → empty token in grams
    "héllo wörld ünïcode τοκεν", // multi-byte UTF-8
    "x x x x x",                 // repeated tokens → repeated hashes
    "long-token-αβγδε b long-token-αβγδε b c")

  test("native ≡ HOF tokenHash60-over-shinglesAll on every edge case") {
    val n = native(cases, k)
    val h = hof(cases, k)
    n.zip(h).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"case $i '${cases(i)}': native $a vs hof $b")
    }
    assert(n(1).isEmpty && n(3).isEmpty, "under-k docs must yield empty arrays")
  }

  test("codegen and interpreted paths agree") {
    val viaCodegen = native(cases, k)
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(native(cases, k) == viaCodegen)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("property: native ≡ HOF on random token soups (ties, unicode, empties)") {
    val token = Gen.oneOf(Gen.oneOf("a", "b", "ab", "ü", ""),
      Gen.listOfN(3, Gen.alphaNumChar).map(_.mkString))
    val doc = Gen.choose(0, 9).flatMap(n => Gen.listOfN(n, token))
      .map(_.mkString(" "))
    val batch = Gen.listOfN(16, doc)
    for (s <- 0 until 10) {
      val rows = batch(Gen.Parameters.default, Seed(s.toLong)).get
      assert(native(rows, k) == hof(rows, k), s"seed $s: $rows")
    }
  }

  test("hash value is the documented md5 prefix (oracle contract)") {
    // one gram "a b c": top 60 bits of md5 — computed independently here
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest("a b c".getBytes("UTF-8"))
    val expect = java.lang.Long.parseLong(
      d.take(8).map("%02x".format(_)).mkString.take(15), 16)
    assert(native(Seq("a b c"), 3) == Seq(Seq(expect)))
  }
}
