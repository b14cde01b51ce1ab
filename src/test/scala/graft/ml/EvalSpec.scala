package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EvalSpec extends SparkSpec {

  test("thresholdSweep: hand confusion counts and exact ppm ratios") {
    val s = spark; import s.implicits._
    // scores 1..4, positives at 3 and 4
    val df = Seq((1L, false), (2L, false), (3L, true), (4L, true))
      .toDF("score_fp", "lab")
    val got = Eval.thresholdSweep(df, "score_fp", col("lab"), Seq(3L, 10L))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) -1L else r.getLong(5),
          if (r.isNullAt(6)) -1L else r.getLong(6)))).toMap
    // t=3: tp=2 fp=0 fn=0 tn=2 → precision/recall 10^6
    assert(got(3L) == ((2L, 0L, 0L, 2L, 1000000L, 1000000L)))
    // t=10: nothing predicted positive → precision NULL, recall 0
    assert(got(10L) == ((0L, 0L, 2L, 2L, -1L, 0L)))
  }

  test("cohensKappa: the textbook 2x2 example gives kappa = 0.4") {
    val s = spark; import s.implicits._
    // counts: (y,y)=20 (y,n)=5 (n,y)=10 (n,n)=15 → po=0.7 pe=0.5 κ=0.4
    val rows =
      Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val r = Eval.cohensKappa(rows.toDF("t", "p"), col("t"), col("p")).head()
    assert(r.getLong(0) == 50L && r.getLong(1) == 35L)
    assert(r.getLong(2) == 700000L && r.getLong(3) == 500000L)
    // (50·35 − 1250) / (2500 − 1250) = 500/1250 = 0.4 exactly in doubles
    assert(r.getDouble(4) == 0.4)
  }

  test("cohensKappa: perfect agreement is 1, zero-information is <= 0") {
    val s = spark; import s.implicits._
    val perfect = Seq(("a", "a"), ("b", "b"), ("c", "c")).toDF("t", "p")
    assert(Eval.cohensKappa(perfect, col("t"), col("p")).head().getDouble(4) == 1.0)
    // predictor always says "a": agreement equals chance on this split
    val const = Seq(("a", "a"), ("b", "a")).toDF("t", "p")
    assert(Eval.cohensKappa(const, col("t"), col("p")).head().getDouble(4) <= 0.0)
  }

  test("calibrationBins: exact cut, floor means on negative scores") {
    val s = spark; import s.implicits._
    // 6 rows, 2 bins: lower half scores {-7,-7,-6}, upper {1,2,3}
    val df = Seq((-7L, 1L, false), (-7L, 2L, false), (-6L, 3L, true),
      (1L, 4L, true), (2L, 5L, true), (3L, 6L, true))
      .toDF("score_fp", "id", "lab")
    val got = Eval.calibrationBins(df, "score_fp", "id", col("lab"), bins = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // bin 1 mean: floor(-20/3) = -7 (floor, not truncation toward zero)
    assert(got(1L) == ((3L, 1L, -7L, 333333L)))
    assert(got(2L) == ((3L, 3L, 2L, 1000000L)))
  }

  test("abTest: z and ppm lift from exact counts; degenerate pairs dropped") {
    val s = spark; import s.implicits._
    val rows = Seq.fill(10)(("A", true)) ++ Seq.fill(90)(("A", false)) ++
      Seq.fill(20)(("B", true)) ++ Seq.fill(80)(("B", false)) ++
      Seq.fill(5)(("C", false)) // C: zero conversions
    val got = Eval.abTest(rows.toDF("v", "c"), col("v"), col("c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = got(("A", "B"))
    assert((ab.getLong(2), ab.getLong(3), ab.getLong(4), ab.getLong(5)) ==
      ((100L, 10L, 100L, 20L)))
    assert(ab.getLong(6) == 1000000L) // +100% lift
    val p1 = 10.0 / 100; val p2 = 20.0 / 100; val pp = 30.0 / 200
    val z = (p2 - p1) / math.sqrt(pp * (1.0 - pp) * (1.0 / 100 + 1.0 / 100))
    assert(ab.getDouble(7) == z)
    // (A,C) and (B,C): C has zero conv — pair still tested (se2 > 0 since
    // pooled p from the other side), lift vs A is -100%
    assert(got(("A", "C")).getLong(6) == -1000000L)
    spark.catalog.clearCache()
  }


  test("targetEncodeLoo: leakage-safe formula, prior pull on rare cats") {
    val s = spark; import s.implicits._
    // cat "big": 4 rows, 2 positive; cat "tiny": 1 row, positive
    val df = Seq(("big", 1L, true), ("big", 2L, true), ("big", 3L, false),
      ("big", 4L, false), ("tiny", 5L, true)).toDF("c", "id", "l")
    val got = Eval.targetEncodeLoo(df, col("c"), col("id"), col("l"),
        priorM = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val rate = 3L * 1000000L / 5L // 600000
    // big positives: (2-1)*1e6 + 2*rate over 4-1+2 = 2200000/5
    assert(got(1L) == (1000000L + 2 * rate) / 5)
    assert(got(3L) == (2000000L + 2 * rate) / 5)
    // tiny: own label removed entirely -> pure prior (0 + 2*rate)/2
    assert(got(5L) == rate)
  }


  test("chiSquared: zero under independence, N*dof under perfect diag") {
    val s = spark; import s.implicits._
    // perfectly independent 2x2 (all cells equal)
    val ind = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .flatMap(Seq.fill(5)(_))
    val ri = Eval.chiSquared(ind.toDF("u", "v"), col("u"), col("v")).head()
    assert((ri.getLong(0), ri.getLong(1), ri.getLong(2), ri.getLong(3)) ==
      ((20L, 4L, 1L, 0L)))
    // perfect diagonal 2x2: chi2 = N = 10 (phi=1, dof=1); the off-diagonal
    // OBSERVED-ZERO cells carry half that mass - dropping them would halve it
    val diag = Seq.fill(5)(("a", "x")) ++ Seq.fill(5)(("b", "y"))
    val rd = Eval.chiSquared(diag.toDF("u", "v"), col("u"), col("v")).head()
    assert(rd.getLong(1) == 4L)            // dense grid, not 2 observed cells
    assert(rd.getLong(3) == 10L * 1000000L)
    spark.catalog.clearCache()
  }

  test("wilsonBounds: brackets the rate, matches the closed form") {
    val s = spark; import s.implicits._
    val rows = Seq.fill(40)(("g", true)) ++ Seq.fill(60)(("g", false))
    val r = Eval.wilsonBounds(rows.toDF("grp", "l"), col("grp"), col("l"))
      .head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((100L, 40L, 400000L)))
    val z = 1.96; val p = 0.4; val n = 100.0
    val den = 1.0 + z * z / n
    val ctr = p + z * z / (2.0 * n)
    val rad = z * math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))
    assert(r.getDouble(4) == (ctr - rad) / den)
    assert(r.getDouble(5) == (ctr + rad) / den)
    assert(r.getDouble(4) < 0.4 && 0.4 < r.getDouble(5))
  }

  test("rankingMetrics: hand-computed nDCG/MRR/recall on a tiny ranking") {
    val s = spark; import s.implicits._
    // query A: ranked docs 1..4; rels: doc2 grade 2, doc4 grade 1, doc9
    // grade 1 (missed entirely). query B: no relevant docs at all.
    val ranked = Seq(("A", 1L, 1), ("A", 2L, 2), ("A", 3L, 3), ("A", 4L, 4),
      ("B", 1L, 1), ("B", 2L, 2)).toDF("q", "doc", "rank")
    val rels = Seq(("A", 2L, 2), ("A", 4L, 1), ("A", 9L, 1), ("B", 5L, 0))
      .toDF("q", "doc", "rel")
    val lut = Eval.ndcgDiscountLut(3)
    val r = Eval.rankingMetrics(ranked, rels, "q", "doc", k = 3)
      .collect().map(x => x.getString(0) -> x).toMap
    val a = r("A")
    assert(a.getLong(1) == 3L) // n_rel
    assert(a.getLong(2) == 1L) // hits in top-3 (doc2; doc4 is rank 4)
    assert(a.getLong(3) == (1L << 30) / 2) // first relevant at rank 2
    // dcg = gain(2)*lut(2) = 3*lut(2); idcg = 3*lut(1) + 1*lut(2) + 1*lut(3)
    assert(a.getLong(4) == 3 * lut(1))
    assert(a.getLong(5) == 3 * lut(0) + lut(1) + lut(2))
    assert(a.getLong(6) == a.getLong(4) * 1000000L / a.getLong(5))
    assert(a.getLong(7) == 1000000L / 3) // recall 1/3
    assert(a.getLong(8) == 1000000L / 3) // precision 1/3
    val b = r("B")
    assert(b.getLong(1) == 0L && b.getLong(2) == 0L && b.getLong(3) == 0L)
    assert(b.isNullAt(6) && b.isNullAt(7)) // ndcg, recall are 0/0
  }

  test("ksTest: hand-computed D with ties; identical samples give 0") {
    val s = spark; import s.implicits._
    // a = {1, 2, 3}, b = {2, 3, 4}: cum diffs |cA*3-cB*3| / 9 peak at
    // v=1: |1*3-0| = 3 → D = 3/9 = 1/3
    val df = (Seq(1L, 2L, 3L).map(("a", _)) ++ Seq(2L, 3L, 4L).map(("b", _)))
      .toDF("g", "v")
    val r = Eval.ksTest(df, col("g"), col("v")).head()
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)) ==
      (("a", "b", 3L, 3L)))
    assert(r.getLong(4) == 333333L && r.getLong(5) == 1L)
    // identical distributions → D = 0
    val same = (Seq(5L, 6L).map(("a", _)) ++ Seq(5L, 6L).map(("b", _)))
      .toDF("g", "v")
    assert(Eval.ksTest(same, col("g"), col("v")).head().getLong(4) == 0L)
    intercept[IllegalArgumentException] {
      Eval.ksTest(Seq(("a", 1L)).toDF("g", "v"), col("g"), col("v"))
    }
  }

  test("mutualInformation: zero under independence, ln2-ish under identity") {
    val s = spark; import s.implicits._
    // perfectly independent 2x2: every cell n=5 → each log ratio = ln(1)=0
    val ind = (for (a <- Seq("x", "y"); b <- Seq("u", "v"); _ <- 1 to 5)
      yield (a, b)).toDF("a", "b")
    val r0 = Eval.mutualInformation(ind, col("a"), col("b")).head()
    assert((r0.getLong(0), r0.getLong(1), r0.getLong(2)) == ((20L, 4L, 0L)))
    // identical columns, 2 balanced values → MI = ln 2 ≈ 0.693147
    val dep = (Seq.fill(10)("x") ++ Seq.fill(10)("y")).map(v => (v, v))
      .toDF("a", "b")
    val r1 = Eval.mutualInformation(dep, col("a"), col("b")).head()
    assert(math.abs(r1.getLong(2) - 693147L) <= 1, s"got ${r1.getLong(2)}")
  }

  test("welchTTest: equal groups give t=0; shifted groups match closed form") {
    val s = spark; import s.implicits._
    val same = (Seq.fill(5)(("a", 10L)) ++ Seq.fill(5)(("b", 10L)) ++
      Seq(("a", 20L), ("b", 20L))).toDF("g", "q")
    val r0 = Eval.welchTTest(same, col("g"), col("q")).head()
    assert(r0.getDouble(6) == 0.0 && r0.getString(0) == "a")
    // a = {0, 2} (mean 1, var 2), b = {10, 12, 14} (mean 12, var 4):
    // t = (1-12)/sqrt(2/2 + 4/3)
    val shifted = (Seq(("a", 0L), ("a", 2L)) ++
      Seq(("b", 10L), ("b", 12L), ("b", 14L))).toDF("g", "q")
    val r1 = Eval.welchTTest(shifted, col("g"), col("q")).head()
    val expT = (1.0 - 12.0) / math.sqrt(2.0 / 2 + 4.0 / 3)
    assert(math.abs(r1.getDouble(6) - expT) < 1e-12, s"t ${r1.getDouble(6)}")
    assert(r1.getDouble(7) > 1.0 && r1.getDouble(7) < 4.0) // Welch df
    intercept[IllegalArgumentException] {
      Eval.welchTTest(Seq(("a", 1L)).toDF("g", "q"), col("g"), col("q"))
    }
  }

  test("aucExact: hand-computed rank-sum with ties; degenerate is NULL") {
    val s = spark; import s.implicits._
    // scores: pos {3, 2}, neg {2, 1} → pairs: (3>2)=1, (3>1)=1,
    // (2=2)=0.5, (2>1)=1 → AUC = 3.5/4 = 0.875
    val df = Seq((3L, true), (2L, true), (2L, false), (1L, false))
      .toDF("score", "label")
    val r = Eval.aucExact(df, "score", col("label")).head()
    assert((r.getLong(0), r.getLong(1)) == ((2L, 2L)))
    assert(r.getLong(2) == 875000L)
    assert(r.getLong(3) == 750000L) // gini = 2*auc - 1
    // perfect separation = 1.0; single-class = NULL
    val perfect = Eval.aucExact(
      Seq((10L, true), (1L, false)).toDF("score", "label"),
      "score", col("label")).head()
    assert(perfect.getLong(2) == 1000000L)
    val oneClass = Eval.aucExact(
      Seq((1L, true), (2L, true)).toDF("score", "label"),
      "score", col("label")).head()
    assert(oneClass.isNullAt(2) && oneClass.isNullAt(3))
  }

  test("sprtTest: trajectory crosses the H1 bound on an all-positive run") {
    val s = spark; import s.implicits._
    val (up, down, a, b) = Eval.sprtConstants(0.2, 0.8, 0.05, 0.05)
    // all positives: llr climbs by `up` each step; crossing at
    // ceil(a/up) observations
    val df = (1L to 10L).map(i => (i, true)).toDF("ord", "label")
    val rows = Eval.sprtTest(df, "ord", col("label"), 0.2, 0.8, 0.05, 0.05)
      .collect().sortBy(_.getLong(0))
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(3) == (i + 1) * up)
      val expected = if ((i + 1) * up >= a) "accept_h1" else "continue"
      assert(r.getString(4) == expected, s"obs ${i + 1}")
    }
    assert(rows.last.getString(4) == "accept_h1")
    // all negatives: llr falls by |down| and crosses the H0 bound
    val neg = Eval.sprtTest((1L to 10L).map(i => (i, false))
        .toDF("ord", "label"), "ord", col("label"), 0.2, 0.8, 0.05, 0.05)
      .collect().sortBy(_.getLong(0))
    assert(down < 0 && b < 0)
    assert(neg.last.getString(4) == "accept_h0")
  }

  test("rankingMetrics: perfect ranking scores ndcg_ppm = 1000000") {
    val s = spark; import s.implicits._
    val ranked = Seq(("q", 10L, 1), ("q", 11L, 2)).toDF("q", "doc", "rank")
    val rels = Seq(("q", 10L, 3), ("q", 11L, 1)).toDF("q", "doc", "rel")
    val r = Eval.rankingMetrics(ranked, rels, "q", "doc", k = 5).head()
    assert(r.getLong(6) == 1000000L)
    assert(r.getLong(3) == (1L << 30)) // first relevant at rank 1
    assert(r.getLong(7) == 1000000L && r.getLong(8) == 1000000L)
  }

}
