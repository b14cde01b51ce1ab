package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The hot-bucket guard: inBucketPairs must equal the plain self-join on
  * any input, and bound per-cell (= per-task) load on degenerate buckets
  * that re-hashing can never split (identical members).
  */
class CandidatePairsSpec extends SparkSpec {
  import spark.implicits._

  private def plainPairs(bucketed: org.apache.spark.sql.DataFrame) =
    bucketed.alias("a")
      .join(bucketed.alias("b"),
        col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()

  test("equivalent to the plain self-join on mixed bucket sizes") {
    // 3 buckets: tiny (3), medium (40), and one member in two buckets.
    val rows =
      (1L to 3L).map(i => (i, 100)) ++
      (10L to 49L).map(i => (i, 200)) ++
      Seq((1L, 200))
    val bucketed = rows.toDF("id", "bk")
    val expected = plainPairs(bucketed).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = CandidatePairs.inBucketPairs(bucketed, cap = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    // sanity: C(3,2) + C(41,2) pairs, and the medium bucket really was
    // split (g = ceil(41/8) = 6 > 1)
    assert(expected.size == 3 + (41 * 40) / 2)
  }

  test("planted identical members: exact clique output, bounded per-cell load") {
    // 2000 members of ONE bucket — the degenerate case extra planes/bands
    // cannot split. cap=100 → g=20 → 210 cells.
    val n = 2000
    val cap = 100
    val bucketed = (1L to n.toLong).toDF("id").withColumn("bk", lit(42))
    val pairs = CandidatePairs.inBucketPairs(bucketed, cap)
    assert(pairs.count() == n.toLong * (n - 1) / 2) // complete, no dup, no miss
    // Per-cell load: no (bk, p, q) cell sees more input rows than ~2x the
    // hash-salt expectation (cap per role side).
    val (a, b) = CandidatePairs.roleSides(bucketed, cap)
    val maxCell = a.unionByName(b).groupBy(col("bk"), col("__p"), col("__q"))
      .agg(count(lit(1)).as("rows")).agg(max(col("rows"))).head.getLong(0)
    assert(maxCell <= 4L * cap, s"hot cell has $maxCell rows (cap=$cap)")
  }

  test("well-sized buckets degenerate to the single (0,0) cell") {
    val bucketed = (1L to 50L).toDF("id").withColumn("bk", lit(7))
    val (a, b) = CandidatePairs.roleSides(bucketed, cap = 2048)
    assert(a.select(col("__p"), col("__q")).distinct().collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((0, 0)))
    assert(b.count() == 50)
    assert(CandidatePairs.inBucketPairs(bucketed).count() == (50 * 49) / 2)
  }

  test("property: equals the plain self-join on random (id, bucket) tables") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.listOfN(120,
      Gen.zip(Gen.chooseNum(0L, 60L), Gen.chooseNum(0, 5)))
    for (i <- 0 until 4) {
      // distinct (id, bk) rows — a member sits in a bucket at most once,
      // matching how every caller produces the table (explode of distinct
      // band/table structs)
      val rows = gen(Gen.Parameters.default, Seed(i.toLong)).get.distinct
      val bucketed = rows.toDF("id", "bk")
      for (cap <- Seq(1, 7, 2048)) {
        val expected = plainPairs(bucketed).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val got = CandidatePairs.inBucketPairs(bucketed, cap)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == expected, s"seed $i cap $cap mismatch")
      }
    }
  }

  test("inBucketPairDots: equals the plain weighted self-join, hot bucket included") {
    // Mixed sizes + a hot bucket at cap=8; deterministic weights from ids.
    val rows = ((1L to 3L).map(i => (i, 100)) ++
      (10L to 49L).map(i => (i, 200)) ++ Seq((1L, 200), (2L, 300)))
      .map { case (i, b) => (i, b, i * 7 - 3 + b % 11) } // per-(id,bk) weights, some negative
    val bucketed = rows.toDF("id", "bk", "__w")
    val expected = bucketed.alias("a")
      .join(bucketed.alias("b"),
        col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"),
        sum(col("a.__w") * col("b.__w")).as("dot"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    val got = CandidatePairs.inBucketPairDots(bucketed, cap = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    // doc 1 shares buckets 100 and 200 with docs 2..3? (1,2) share only
    // bucket 100; sanity: the hot bucket's pairs all present
    assert(got.size == expected.size && got.nonEmpty)
  }

  test("no CartesianProduct in the guarded candidate plan") {
    val bucketed = (1L to 100L).toDF("id").withColumn("bk", pmod(col("id"), lit(5)))
    val plan = CandidatePairs.inBucketPairs(bucketed, cap = 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  private def plainCross(big: org.apache.spark.sql.DataFrame,
                         small: org.apache.spark.sql.DataFrame) =
    big.alias("a").join(small.alias("b"), col("a.bk") === col("b.bk"))
      .select(col("a.id").as("id_big"), col("b.id").as("id_small"))

  test("crossBucketPairs: equals the plain bipartite join, each pair once per shared bucket") {
    // big: hot bucket 200 (40 members) + tiny bucket 100; small overlaps
    // both, plus a small-only bucket 300 (must yield nothing) and one
    // member sharing TWO buckets with a big member (multiplicity 2).
    val big = ((1L to 3L).map(i => (i, 100)) ++
      (10L to 49L).map(i => (i, 200)) ++ Seq((1L, 200))).toDF("id", "bk")
    val small = Seq((70L, 100), (70L, 200), (71L, 200), (72L, 300))
      .toDF("id", "bk")
    val expected = plainCross(big, small).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(identity)
      .view.mapValues(_.length).toMap
    val got = CandidatePairs.crossBucketPairs(big, small, cap = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(identity)
      .view.mapValues(_.length).toMap
    assert(got == expected)
    // doc 1 shares buckets 100 AND 200 with small doc 70 → multiplicity 2
    assert(got((1L, 70L)) == 2)
    // the hot bucket really was split: g = ceil(41/8) = 6 cells
  }

  test("crossBucketPairs: hot big-side bucket bounds per-cell big input at cap") {
    val n = 2000
    val cap = 100
    val big = (1L to n.toLong).toDF("id").withColumn("bk", lit(42))
    val small = (9001L to 9005L).toDF("id").withColumn("bk", lit(42))
    val pairs = CandidatePairs.crossBucketPairs(big, small, cap)
    assert(pairs.count() == n.toLong * 5) // complete bipartite, exactly once
    // per-(bk, salt-cell) big-side input is hash-balanced around cap
    val sizes = big.groupBy(col("bk")).agg(count(lit(1)).as("__m"))
      .withColumn("__g", ceil(col("__m") / cap).cast("int"))
    val maxCell = big.join(sizes, "bk")
      .select(col("bk"), pmod(xxhash64(col("id")), col("__g")).as("__s"))
      .groupBy(col("bk"), col("__s")).agg(count(lit(1)).as("rows"))
      .agg(max(col("rows"))).head.getLong(0)
    assert(maxCell <= 2L * cap, s"hot cell has $maxCell big rows (cap=$cap)")
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
