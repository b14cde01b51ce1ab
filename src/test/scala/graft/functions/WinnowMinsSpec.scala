package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Native winnowing expression: the r12-verdict replacement for the HOF
  * window sweep. Pinned three ways — native codegen vs native interpreted
  * vs the original slice/array_min/reverse HOF recipe (the executable
  * reference the q174 oracle replays) — plus the paper's guarantees and
  * property-test coverage of adversarial hash sequences (ties, monotone
  * runs, constants).
  */
class WinnowMinsSpec extends SparkSpec {
  import spark.implicits._

  private val w = 4

  /** The original staged-HOF recipe (TextDedup pre-r13) as the executable
    * reference: every length-w window's rightmost-minimal (pos, hash),
    * array_distinct'd.
    */
  private def hofFingerprints(rows: Seq[Seq[Long]], w: Int): Seq[Set[(Long, Long)]] = {
    val windowSel = transform(
      sequence(lit(1L), col("__n") - (w - 1L)),
      i => {
        val sub = slice(col("__h"), i.cast("int"), lit(w))
        val m = array_min(sub)
        struct((i + w - array_position(reverse(sub), m)).as("pos"),
          m.as("fp_hash"))
      })
    val wholeSel = {
      val m = array_min(col("__h"))
      array(struct(
        (lit(1L) + col("__n") - array_position(reverse(col("__h")), m))
          .as("pos"),
        m.as("fp_hash")))
    }
    rows.zipWithIndex.toDF("__h", "__i").sort("__i")
      .withColumn("__n", size(col("__h")).cast("long"))
      .select(col("__i"), array_distinct(
        when(col("__n") >= w, windowSel).otherwise(wholeSel)).as("f"))
      .sort("__i")
      .collect()
      .map(_.getSeq[org.apache.spark.sql.Row](1)
        .map(r => (r.getLong(0), r.getLong(1))).toSet).toSeq
  }

  private def nativeFingerprints(rows: Seq[Seq[Long]], w: Int): Seq[Seq[(Long, Long)]] = {
    WinnowMins.register(spark)
    rows.zipWithIndex.toDF("__h", "__i")
      .select(col("__i"), WinnowMins.fingerprints(col("__h"), w).as("f"))
      .sort("__i")
      .collect()
      .map(_.getSeq[org.apache.spark.sql.Row](1)
        .map(r => (r.getLong(0), r.getLong(1)))).toSeq
  }

  private val cases: Seq[Seq[Long]] = Seq(
    Seq(5L),                                  // shorter than w: whole-array window
    Seq(5L, 3L),                              // short, tie-free
    Seq(7L, 7L, 7L),                          // short, all ties → rightmost
    Seq(9L, 2L, 5L, 2L),                      // exactly w, interior tie → rightmost
    Seq(1L, 2L, 3L, 4L, 5L, 6L),              // increasing: min leaves window
    Seq(6L, 5L, 4L, 3L, 2L, 1L),              // decreasing: new min every step
    Seq(4L, 4L, 4L, 4L, 4L, 4L),              // constant: rightmost tie advances
    Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L, 1L),  // repeated equal minima apart
    Seq(Long.MaxValue, Long.MinValue, 0L, -1L, 1L))

  test("native codegen ≡ original HOF recipe on every edge case") {
    val native = nativeFingerprints(cases, w)
    val hof = hofFingerprints(cases, w)
    native.zip(hof).zipWithIndex.foreach { case ((n, h), i) =>
      assert(n.toSet == h, s"case $i: native $n vs hof $h")
      assert(n.distinct == n, s"case $i: native emitted duplicates: $n")
      assert(n == n.sortBy(_._1), s"case $i: native must emit ascending pos: $n")
    }
  }

  test("codegen and interpreted paths agree; empty array yields empty result") {
    val data = cases :+ Seq.empty[Long]
    val viaCodegen = nativeFingerprints(data, w)
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = nativeFingerprints(data, w)
      assert(viaCodegen == interpreted)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(viaCodegen.last.isEmpty, "empty hash array → no fingerprints")
  }

  test("property: native ≡ HOF on random arrays with heavy tie pressure") {
    // small value domain forces ties; lengths straddle w
    val batch: Gen[List[List[Long]]] = Gen.listOfN(12,
      Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, Gen.choose(0L, 6L))))
    for (s <- 0 until 12) {
      val rs = batch(Gen.Parameters.default, Seed(s.toLong)).get.map(_.toSeq)
      assert(nativeFingerprints(rs, w).map(_.toSet) == hofFingerprints(rs, w),
        s"seed $s")
    }
  }

  test("paper guarantees: coverage (≥1 fp per window span) and shared-run detection") {
    // every gap between consecutive selected positions is < w (no window
    // goes unrepresented), for a long mixed sequence
    val h = Seq(8L, 3L, 9L, 1L, 7L, 1L, 6L, 2L, 2L, 5L, 0L, 4L, 8L, 3L)
    val fps = nativeFingerprints(Seq(h), w).head
    val poss = fps.map(_._1)
    poss.zip(poss.drop(1)).foreach { case (a, b) =>
      assert(b - a <= w, s"gap $a→$b exceeds window width $w")
    }
    // two docs sharing a run of w+k−1 tokens share ≥1 fingerprint HASH:
    // model at the hash level — a shared run of w consecutive equal
    // hashes guarantees a common fp_hash
    val shared = Seq(11L, 5L, 13L, 7L)
    val d1 = Seq(20L, 21L) ++ shared ++ Seq(22L)
    val d2 = shared ++ Seq(30L, 31L, 32L)
    val Seq(f1, f2) = nativeFingerprints(Seq(d1, d2), w)
    assert(f1.map(_._2).toSet.intersect(f2.map(_._2).toSet).nonEmpty,
      s"shared w-run must share a fingerprint hash: $f1 vs $f2")
  }
}
