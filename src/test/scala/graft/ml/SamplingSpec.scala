package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private def ids(n: Int) = {
    val s = spark; import s.implicits._
    (0L until n.toLong).toDF("id")
  }

  test("hashSplit puts every row in exactly one split, consistent with its bucket") {
    val out = Sampling.hashSplit(ids(1000), col("id"), "s-",
        Seq("train" -> 80, "validation" -> 10, "test" -> 10))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.length == 1000)
    out.foreach { case (_, b, s) =>
      assert(b >= 0 && b < 100)
      val expected = if (b < 80) "train" else if (b < 90) "validation" else "test"
      assert(s == expected)
    }
    // buckets are uniform-ish: the 80% split holds within wide tolerance
    val train = out.count(_._3 == "train")
    assert(train > 700 && train < 900, s"train split off: $train/1000")
  }

  test("hashSplit rejects non-positive percents even when they sum to 100") {
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(ids(10), col("id"), "s-", Seq("a" -> -10, "b" -> 110))
    }
  }

  test("hashSplit membership is a pure function of the id (append-stable)") {
    def splitOf(df: org.apache.spark.sql.DataFrame) =
      Sampling.hashSplit(df, col("id"), "s-", Seq("a" -> 50, "b" -> 50))
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val full = splitOf(ids(500))
    val subset = splitOf(ids(500).filter(col("id") % 3 === 0))
    subset.foreach { case (id, s) => assert(full(id) == s) }
  }

  test("stratifiedSample caps each stratum at n with contiguous ranks, deterministically") {
    val s = spark; import s.implicits._
    val df = (0L until 300L).map(i => (i, (i % 3).toString)).toDF("id", "stratum")
    def run() = Sampling.stratifiedSample(df, Seq("stratum"), col("id"), 7, "x-")
      .collect().map(r => (r.getString(1), r.getLong(0), r.getInt(2))).toSet
    val out = run()
    assert(out == run(), "stratified sample must be deterministic")
    val byStratum = out.groupBy(_._1)
    assert(byStratum.keySet == Set("0", "1", "2"))
    byStratum.values.foreach { rows =>
      assert(rows.size == 7)
      assert(rows.map(_._3) == (1 to 7).toSet)
    }
  }

  test("stratifiedSample bounds per-task input on a hot stratum (two-stage top-k)") {
    val s = spark; import s.implicits._
    // one hot stratum with 100k rows next to a tiny one
    val df = ((0L until 100000L).map(i => (i, "hot")) ++
      (0L until 20L).map(i => (100000L + i, "cold"))).toDF("id", "stratum")
    val n = 5; val buckets = 8
    val sampled = Sampling.stratifiedSample(df, Seq("stratum"), col("id"), n,
      "hot-", saltBuckets = buckets)
    // identical to the naive single-window formulation
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("stratum"))
      .orderBy(Sampling.hash60(col("id"), "hot-").asc, col("id").asc)
    val naive = df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= n)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(sampled.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet == naive)
    // the final ranking window consumes at most saltBuckets·n rows per
    // stratum, never the raw stratum
    val partialOnly = df.withColumn("__prank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("stratum"),
            pmod(Sampling.hash60(col("id"), "hot-"), lit(buckets.toLong)))
          .orderBy(Sampling.hash60(col("id"), "hot-").asc, col("id").asc)))
      .filter(col("__prank") <= n)
    val perStratum = partialOnly.groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perStratum("hot") <= buckets.toLong * n)
    assert(sampled.queryExecution.executedPlan.toString
      .split("\n").count(_.contains("Window")) >= 2,
      "expected the two-stage (partial + final) window plan")
  }

  test("mixtureSample keeps exactly the rows whose hash bucket clears the stratum rate") {
    val s = spark; import s.implicits._
    val df = (0L until 400L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang")
    val kept = Sampling.mixtureSample(df, col("lang"), col("id"), "m-",
        Seq("en" -> 75), 25)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    kept.foreach { case (_, lang, rate) =>
      assert(rate == (if (lang == "en") 75 else 25))
    }
    val expected = df
      .withColumn("rate_pct",
        when(col("lang") === "en", 75).otherwise(25))
      .filter(Sampling.hashBucket(col("id"), "m-", 100) < col("rate_pct"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(kept == expected)
    // rates actually bite: en keeps more than de, neither keeps everything
    val en = kept.count(_._2 == "en"); val de = kept.count(_._2 == "de")
    assert(en > de && en < 200 && de > 0)
  }

  test("tokenBudgetSample keeps the maximal hash-order prefix within each budget") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(3)
    val df = (0L until 200L).map(i => ("g" + (i % 3), i, rnd.nextInt(40) + 1))
      .toDF("grp", "id", "tok")
    // Driver-side replay of the contract: sort by (hash60, id) per group,
    // inclusive prefix sum over EVERY row, keep rows whose sum <= budget
    // (the cumsum keeps growing past dropped rows — prefix semantics, not
    // skip-and-continue packing).
    val hashes = df.select(col("grp"), col("id"), col("tok"),
        Sampling.hash60(col("id"), "b-").as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    val expected = hashes.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      var run = 0L
      rows.sortBy(r => (r._4, r._2)).flatMap { case (g, id, tok, _) =>
        run += tok
        if (run <= 500L) Some((g, id, run)) else None
      }
    }.toSet
    val got = Sampling.tokenBudgetSample(df, Seq("grp"), col("id"), "tok",
        500L, "b-")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(got == expected)
  }

  test("tokenBudgetSample: two-stage scan ≡ single bucket; partitioning-independent") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(9)
    val df = (0L until 300L).map(i => ("g" + (i % 2), i, rnd.nextInt(25) + 1))
      .toDF("grp", "id", "tok")
    def keySet(d: org.apache.spark.sql.DataFrame, buckets: Int) =
      Sampling.tokenBudgetSample(d, Seq("grp"), col("id"), "tok", 700L, "b-",
          rangeBuckets = buckets)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    val one = keySet(df, 1)
    assert(keySet(df, 64) == one, "bucketed scan must equal the serial scan")
    assert(keySet(df.repartition(7), 64) == one)
  }

  test("tokenBudgetSample edges: zero budget keeps the zero-token hash prefix; negative budget rejected") {
    val s = spark; import s.implicits._
    val df = Seq(("g", 1L, 0), ("g", 2L, 5), ("g", 3L, 0)).toDF("grp", "id", "tok")
    // Prefix semantics: with budget 0, exactly the zero-token rows that
    // hash BEFORE the first positive-token row survive (a zero-token row
    // after the overflow inherits the overflowed cumsum and drops).
    val order = df.select(col("id"), col("tok"),
        Sampling.hash60(col("id"), "z-").as("h"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(r => (r._3, r._1))
    val expected = order.takeWhile(_._2 == 0).map(_._1).toSet
    val kept = Sampling.tokenBudgetSample(df, Seq("grp"), col("id"), "tok",
        0L, "z-")
      .collect().map(_.getLong(1)).toSet
    assert(kept == expected)
    intercept[IllegalArgumentException](
      Sampling.tokenBudgetSample(df, Seq("grp"), col("id"), "tok", -1L, "z-"))
  }

  test("packSequences lays documents head-to-tail with exact integer sequence math") {
    val s = spark; import s.implicits._
    val df = (0L until 100L).map(i => ("g" + (i % 2), i, 100 + (i % 7).toInt))
      .toDF("grp", "id", "tok")
    val out = Sampling.packSequences(df, Seq("grp"), Seq("id"), "tok", 256)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    out.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._2)
      var offset = 0L
      sorted.foreach { case (_, _, tok, packOffset, seqIdx, seqOffset) =>
        assert(packOffset == offset, "offsets must be the exclusive running sum")
        assert(seqIdx == offset / 256 && seqOffset == offset % 256)
        offset += tok
      }
    }
  }

  test("weightedSample: priorities replay driver-side; ranks contiguous; k respected") {
    val s = spark; import s.implicits._
    val rows = (0 until 300).map(i => (i.toLong, s"g${i % 3}", (i % 7 + 1) * 10L))
    val df = rows.toDF("id", "grp", "w")
    val got = Sampling.weightedSample(df, Seq("grp"), col("id"), "w", 5, "ws-")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("grp"),
        r.getAs[Long]("priority"), r.getAs[Int]("rank")))
    // driver-side replay of priority = h div w and the per-group order
    def h60(sfx: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ws-$sfx".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 15), 16)
    }
    val expect = rows.map { case (id, g, w) => (id, g, h60(id.toString) / w) }
      .groupBy(_._2).flatMap { case (g, rs) =>
        rs.sortBy(r => (r._3, r._1)).take(5).zipWithIndex
          .map { case ((id, _, p), i) => (id, g, p, i + 1) }
      }.toSet
    assert(got.toSet == expect)
    assert(got.count(_._2 == "g0") == 5)
  }

  test("weightedSample: inclusion tracks weight (heavy rows dominate across many groups)") {
    val s = spark; import s.implicits._
    // 200 groups, each with one weight-1000 row and nine weight-1 rows:
    // the heavy row should win the k=1 slot in the overwhelming majority.
    val rows = for (g <- 0 until 200; i <- 0 until 10)
      yield (g * 10L + i, s"g$g", if (i == 0) 1000L else 1L)
    val winners = Sampling.weightedSample(rows.toDF("id", "grp", "w"),
        Seq("grp"), col("id"), "w", 1, "ws2-")
      .collect().map(r => r.getAs[Long]("id"))
    val heavyWins = winners.count(_ % 10 == 0)
    assert(heavyWins >= 180, s"heavy row won only $heavyWins of 200 groups")
  }

  test("weightedSample: partitioning-independent and validates inputs") {
    val s = spark; import s.implicits._
    val df = (0 until 100).map(i => (i.toLong, "g", i % 9 + 1L)).toDF("id", "grp", "w")
    val a = Sampling.weightedSample(df, Seq("grp"), col("id"), "w", 7, "x-")
      .collect().map(_.toSeq).toSet
    val b = Sampling.weightedSample(df.repartition(13), Seq("grp"), col("id"), "w", 7, "x-")
      .collect().map(_.toSeq).toSet
    assert(a == b)
    intercept[IllegalArgumentException] {
      Sampling.weightedSample(df, Seq("grp"), col("id"), "w", 0, "x-")
    }
    intercept[IllegalArgumentException] {
      Sampling.weightedSample(df, Seq.empty, col("id"), "w", 1, "x-")
    }
  }

  test("splitLeakage: cross-split pairs flagged, within-split pairs clean") {
    val s = spark; import s.implicits._
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L))
      .toDF("doc_a", "doc_b")
    val splits = Seq(
      (1L, "train"), (2L, "train"),      // within
      (3L, "train"), (4L, "test"),       // leak
      (5L, "test"), (6L, "train"),       // leak, reversed order
      (7L, "validation"), (8L, "validation"))
      .toDF("id", "split")
    val got = Sampling.splitLeakage(pairs, splits)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == Map(
      ("train", "train") -> ((1L, false)),
      ("test", "train") -> ((2L, true)),
      ("validation", "validation") -> ((1L, false))))
  }

  test("dsirWeights: hand-computed log-ratio on known buckets") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "en", "aa aa"), (2L, "en", "bb"), (3L, "de", "aa cc"))
      .toDF("doc_id", "lang", "text")
    val b = 8
    // resolve each token's bucket with the same md5 recipe
    val bucketOf = Seq("aa", "bb", "cc").toDF("w")
      .select(col("w"), Sampling.hashBucket(col("w"), "dsir-spec", b).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Sampling.dsirWeights(docs, "doc_id", "text",
        col("lang") === "en", buckets = b, salt = "dsir-spec")
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // token stream: aa aa (en), bb (en), aa cc (de) → per-bucket counts
    val all = Seq("aa" -> true, "aa" -> true, "bb" -> true,
      "aa" -> false, "cc" -> false)
    val cr = all.groupBy(t => bucketOf(t._1)).view.mapValues(_.size.toLong).toMap
    val ct = all.filter(_._2).groupBy(t => bucketOf(t._1))
      .view.mapValues(_.size.toLong).toMap
    val (tr, tt) = (5.0, 3.0)
    def w(tok: String): Long = {
      val bk = bucketOf(tok)
      val ratio = ((ct.getOrElse(bk, 0L) + 0.5) / (tt + b * 0.5)) /
        ((cr(bk) + 0.5) / (tr + b * 0.5))
      math.floor(math.log(ratio) * 1000000.0).toLong
    }
    val exp1 = w("aa") + w("aa")
    assert(got(1L) == ((2L, exp1, exp1 / 1000000.0 / 2)))
    assert(got(2L)._2 == w("bb"))
    assert(got(3L)._2 == w("aa") + w("cc"))
  }

  test("dsirWeights: all-target predicate gives identically zero weights") {
    val s = spark; import s.implicits._
    val docs = graft.sources.Tables.documents(spark, sfDir).limit(50)
    val got = Sampling.dsirWeights(docs, "doc_id", "text", lit(true))
      .collect()
    assert(got.nonEmpty)
    // ct = cr and Tt = Tr bucket-for-bucket → every ratio is exactly 1,
    // ln → 0, floor → 0
    assert(got.forall(_.getLong(2) == 0L))
    spark.catalog.clearCache()
  }

  test("temperatureWeights: exact ppm shares for perfect-square counts") {
    val s = spark; import s.implicits._
    // counts 100 and 400: sqrt exact -> q = 10*2^20 and 20*2^20
    val df = ((0 until 100).map(i => ("small", i)) ++
      (0 until 400).map(i => ("big", i))).toDF("src", "i")
    val got = Sampling.temperatureWeights(df, "src")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("small") == ((100L, 333333L)))  // 10/30 ppm floor
    assert(got("big") == ((400L, 666666L)))    // 20/30 ppm floor
  }


  test("mixtureEntropy: uniform mix gives ln(k), single group gives 0") {
    val s = spark; import s.implicits._
    val df = Seq(("en", "s1"), ("en", "s2"),            // uniform over 2
      ("de", "s1"), ("de", "s1"), ("de", "s1"), ("de", "s1")) // single
      .toDF("lang", "source")
    val got = Sampling.mixtureEntropy(df, "lang", "source")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("en") == ((2L, 2L, 693147L)))  // floor(ln(2)·10^6)
    assert(got("de") == ((4L, 1L, 0L)))
  }


  test("quantileNormalize: ceil rank remap onto the pooled distribution") {
    val s = spark; import s.implicits._
    val df = (Seq(("A", 1L, 1L), ("A", 2L, 2L), ("A", 3L, 3L)) ++
      Seq(10L, 20L, 30L, 40L, 50L, 60L).zipWithIndex.map { case (v, i) =>
        ("B", 10L + i, v) }).toDF("src", "id", "score_fp")
    val got = Sampling.quantileNormalize(df, "src", "id", "score_fp")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    // N=9; A (n=3): ranks 1,2,3 -> global targets 3,6,9 -> values 3,30,60
    assert(got(("A", 1L)) == 3L && got(("A", 2L)) == 30L && got(("A", 3L)) == 60L)
    // B (n=6): targets ceil(r*9/6) = 2,3,5,6,8,9 -> 2,3,20,30,50,60
    assert(Seq(10L, 11L, 12L, 13L, 14L, 15L).map(i => got(("B", i))) ==
      Seq(2L, 3L, 20L, 30L, 50L, 60L))
    spark.catalog.clearCache()
  }

  test("leakageSafeSplit: components never straddle, singletons covered") {
    val s = spark; import s.implicits._
    val docs = (1L to 20L).toDF("doc_id")
    // clusters {1,2,3}, {10,11}; everything else singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val out = Sampling.leakageSafeSplit(docs, "doc_id", pairs, testPct = 30)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(out.size == 20)
    // cluster members share component AND split
    assert(Seq(1L, 2L, 3L).map(out(_)).distinct.size == 1)
    assert(out(1L)._1 == 1L)
    assert(Seq(10L, 11L).map(out(_)).distinct.size == 1)
    assert(out(10L)._1 == 10L)
    // singletons are their own component
    assert(out(7L)._1 == 7L && out(15L)._1 == 15L)
    // split is the component-id hash bucket — deterministic across runs
    val again = Sampling.leakageSafeSplit(docs, "doc_id", pairs, 30)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert((1L to 20L).forall(i => again(i) == out(i)._2))
    assert(out.values.map(_._2).toSet.subsetOf(Set("test", "train")))
  }

}
