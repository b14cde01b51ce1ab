package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HLL + count-min sketch contracts: estimator accuracy in the designed
  * regime, exact invariance to duplication and partitioning, and the
  * shard-merge property that makes both sketches the 100 TB shape.
  */
class SketchesSpec extends SparkSpec {

  // ---- HyperLogLog ----

  test("HLL estimate lands within the sketch's error regime (p=8, ±6.5% σ)") {
    val s = spark; import s.implicits._
    val df = (0 until 5000).map(i => ("g", i)).toDF("grp", "v")
    val est = Sketches.hllDistinct(df, Seq("grp"), col("v"), 8)
      .collect().head.getLong(1)
    // Deterministic hashes → this is a FIXED number; 3σ band asserted.
    assert(math.abs(est - 5000.0) / 5000.0 < 0.20, s"estimate $est vs 5000")
  }

  test("HLL is a function of the DISTINCT set: duplication changes nothing") {
    val s = spark; import s.implicits._
    val once = (0 until 2000).map(i => ("g", i)).toDF("grp", "v")
    val thrice = (0 until 3).flatMap(_ => (0 until 2000).map(i => ("g", i)))
      .toDF("grp", "v")
    val a = Sketches.hllDistinct(once, Seq("grp"), col("v"), 6).collect().head.getLong(1)
    val b = Sketches.hllDistinct(thrice, Seq("grp"), col("v"), 6).collect().head.getLong(1)
    assert(a == b)
  }

  test("HLL registers merge by max: shard sketches == whole-corpus sketch") {
    val s = spark; import s.implicits._
    val whole = (0 until 4000).map(i => ("g", i)).toDF("grp", "v")
    val half1 = (0 until 2500).map(i => ("g", i)).toDF("grp", "v")
    val half2 = (1500 until 4000).map(i => ("g", i)).toDF("grp", "v")
    val merged = Sketches.hllMerge(
        Sketches.hllRegisters(half1, Seq("grp"), col("v"), 7),
        Sketches.hllRegisters(half2, Seq("grp"), col("v"), 7), Seq("grp"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val direct = Sketches.hllRegisters(whole, Seq("grp"), col("v"), 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(merged == direct, "merge(max) must equal the whole-corpus registers")
  }

  test("HLL register table shape: ≤ m buckets, rho within [1, 61-p]") {
    val s = spark; import s.implicits._
    val df = (0 until 3000).map(i => (i % 2, i)).toDF("grp", "v")
    val regs = Sketches.hllRegisters(df, Seq("grp"), col("v"), 5).collect()
    val perGroup = regs.groupBy(_.getInt(0)).view.mapValues(_.length)
    assert(perGroup.values.forall(_ <= 32))
    assert(regs.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 32))
    assert(regs.forall(r => r.getInt(2) >= 1 && r.getInt(2) <= 56))
    intercept[IllegalArgumentException] {
      Sketches.hllRegisters(df, Seq("grp"), col("v"), 12)
    }
    intercept[IllegalArgumentException] {
      Sketches.hllRegisters(df, Seq("grp"), col("v"), 3)
    }
  }

  test("HLL estimate is partitioning-independent (exact, not approximate)") {
    val s = spark; import s.implicits._
    val df = (0 until 3000).map(i => ("g", i)).toDF("grp", "v")
    val a = Sketches.hllDistinct(df, Seq("grp"), col("v"), 8).collect().head.getLong(1)
    val b = Sketches.hllDistinct(df.repartition(13), Seq("grp"), col("v"), 8)
      .collect().head.getLong(1)
    assert(a == b)
  }

  // ---- Count-min ----

  /** Planted corpus: one hot token, one warm, 200 singleton fillers. */
  private def plantedTokens = {
    val s = spark; import s.implicits._
    (Seq.fill(500)("hot") ++ Seq.fill(50)("warm") ++
      (0 until 200).map(i => s"rare$i")).toDF("token")
  }

  test("CMS one-sided guarantee: estimate >= true count for EVERY token") {
    val toks = plantedTokens
    val truth = toks.groupBy(col("token")).agg(count(lit(1)).as("true_cnt"))
    val est = Sketches.cmsEstimates(
      Sketches.cmsSketch(toks, "token", 4, 64), toks.distinct(), "token", 4, 64)
    val underestimates = est.join(truth, "token")
      .filter(col("est_count") < col("true_cnt")).count()
    assert(underestimates == 0, "count-min must never undercount")
  }

  test("CMS with ample width is exact; collisions only ever inflate") {
    val toks = plantedTokens
    val truth = toks.groupBy(col("token")).agg(count(lit(1)).as("true_cnt"))
    val est = Sketches.cmsEstimates(
      Sketches.cmsSketch(toks, "token", 4, 4096), toks.distinct(), "token", 4, 4096)
    val wrong = est.join(truth, "token")
      .filter(col("est_count") =!= col("true_cnt")).count()
    assert(wrong == 0, "251 tokens vs 4x4096 cells: no collisions expected")
  }

  test("CMS sketches merge by cell-wise sum: shards == whole corpus") {
    val s = spark; import s.implicits._
    val half1 = (Seq.fill(250)("hot") ++ (0 until 100).map(i => s"rare$i")).toDF("token")
    val half2 = (Seq.fill(250)("hot") ++ Seq.fill(50)("warm") ++
      (100 until 200).map(i => s"rare$i")).toDF("token")
    val merged = Sketches.cmsSketch(half1, "token", 4, 64)
      .unionByName(Sketches.cmsSketch(half2, "token", 4, 64))
      .groupBy(col("hash_row"), col("bucket")).agg(sum(col("cnt")).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val direct = Sketches.cmsSketch(plantedTokens, "token", 4, 64)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged == direct)
  }

  test("CMS top-k surfaces the heavy hitters in order, k-limited") {
    val top = Sketches.cmsTopK(plantedTokens, "token", 4, 64, 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(top.length == 2)
    assert(top.head._1 == "hot" && top.head._2 >= 500L)
    assert(top(1)._1 == "warm" && top(1)._2 >= 50L)
    intercept[IllegalArgumentException] {
      Sketches.cmsTopK(plantedTokens, "token", 4, 63, 2) // w not a power of 2
    }
    intercept[IllegalArgumentException] {
      Sketches.cmsTopK(plantedTokens, "token", 0, 64, 2)
    }
  }

  test("CMS sketch size is fixed at d x w regardless of corpus size") {
    val s = spark; import s.implicits._
    val big = (0 until 20000).map(i => s"t${i % 700}").toDF("token")
    assert(Sketches.cmsSketch(big, "token", 4, 64).count() <= 4L * 64)
  }

  // ---- Bloom filter ----

  private def probeSet(built: Seq[Long], probe: Seq[Long],
                       mBits: Int = 4096, k: Int = 4): Map[Long, Boolean] = {
    val s = spark; import s.implicits._
    val words = Sketches.bloomWords(built.toDF("v"), col("v"), mBits, k)
    Sketches.bloomProbe(words, probe.toDF("v"), col("v"), mBits, k)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
  }

  test("bloom: NO false negatives, and false positives stay near theory") {
    val built = (0L until 300L).toSeq
    val hits = probeSet(built, 0L until 5000L)
    assert(built.forall(hits(_)), "a member probed negative")
    // (1 - e^(-kn/m))^k with n=300, m=4096, k=4 → ~0.6%; allow 4x slack
    // (deterministic hashes: this is a FIXED count, the band documents it).
    val fp = (300L until 5000L).count(hits(_))
    assert(fp <= 4700 * 0.025, s"$fp false positives of 4700 non-members")
  }

  test("bloom: word table is fixed-size, absent words mean miss") {
    val s = spark; import s.implicits._
    val words = Sketches.bloomWords(Seq(1L).toDF("v"), col("v"), 4096, 4)
    assert(words.count() <= 4) // 4 hashes set at most 4 words of 128
    // probing an empty bloom: everything misses (left join finds no word)
    val empty = Sketches.bloomWords(Seq.empty[Long].toDF("v"), col("v"), 4096, 4)
    val misses = Sketches.bloomProbe(empty, (0L until 50L).toDF("v"), col("v"), 4096, 4)
    assert(misses.filter(col("bloom_hit")).count() == 0)
  }

  test("bloom: shard merge (bit_or) equals the whole-set bloom exactly") {
    val s = spark; import s.implicits._
    val a = (0L until 200L).toSeq
    val b = (150L until 400L).toSeq
    val merged = Sketches.bloomMerge(
        Sketches.bloomWords(a.toDF("v"), col("v"), 2048, 4),
        Sketches.bloomWords(b.toDF("v"), col("v"), 2048, 4))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val whole = Sketches.bloomWords((a ++ b).distinct.toDF("v"), col("v"), 2048, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(merged == whole)
  }

  test("histogram sketch: clamped edges, fixed size, merge == whole") {
    val s = spark; import s.implicits._
    val vals = Seq(-500L, 0L, 1L, 99L, 100L, 250L, 999L, 1000L, 5000L)
      .map(("g", _))
    val df = vals.toDF("grp", "v")
    // 10 bins over [0, 1000): -500 clamps to bin 0, >= 1000 to bin 9
    val sk = Sketches.histSketch(df, Seq("grp"), col("v"), 0L, 1000L, 10)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(sk(0L) == 4)  // -500, 0, 1, 99
    assert(sk(1L) == 1 && sk(2L) == 1)  // 100; 250
    assert(sk(9L) == 3)  // 999, 1000 (clamp), 5000 (clamp)
    assert(sk.keys.forall(b => b >= 0 && b <= 9))
    val half1 = vals.take(4).toDF("grp", "v")
    val half2 = vals.drop(4).toDF("grp", "v")
    val merged = Sketches.histMerge(
        Sketches.histSketch(half1, Seq("grp"), col("v"), 0L, 1000L, 10),
        Sketches.histSketch(half2, Seq("grp"), col("v"), 0L, 1000L, 10), Seq("grp"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(merged == sk)
  }

  test("histogram quantiles: the selected bin contains the exact quantile") {
    val s = spark; import s.implicits._
    val data = (1 to 1000).map(i => ("g", (i * i % 7919).toLong))
    val df = data.toDF("grp", "v")
    val sk = Sketches.histSketch(df, Seq("grp"), col("v"), 0L, 8000L, 32)
    val qs = Sketches.histQuantiles(sk, Seq("grp"), 0L, 8000L, 32, Seq(500, 950, 1000))
      .collect().map(r => r.getInt(1) -> (r.getLong(3), r.getLong(4))).toMap
    val sorted = data.map(_._2).sorted
    for ((q, (blo, bhi)) <- qs) {
      val exact = sorted((sorted.size * q + 999) / 1000 - 1)
      assert(blo <= exact && exact < bhi,
        s"p$q: exact $exact outside selected bin [$blo, $bhi)")
    }
    intercept[IllegalArgumentException] {
      Sketches.histQuantiles(sk, Seq("grp"), 0L, 8000L, 32, Seq(0))
    }
    intercept[IllegalArgumentException] {
      Sketches.histSketch(df, Seq("grp"), col("v"), 10L, 10L, 8)
    }
  }

  test("bloomPrune: agrees with the verdict probe; fact side never hash-shuffles") {
    val s = spark; import s.implicits._
    val built = (0L until 300L).toSeq
    val words = Sketches.bloomWords(built.toDF("v"), col("v"), 4096, 4)
    val facts = (0L until 3000L).map(i => (i, s"payload$i")).toDF("v", "payload")
    val pruned = Sketches.bloomPrune(words, facts, col("v"), 4096, 4)
    val survivors = pruned.collect().map(_.getLong(0)).toSet
    // exactly the verdict-probe hit set (same bits, two formulations)
    val verdicts = Sketches.bloomProbe(words, facts.select(col("v")), col("v"), 4096, 4)
      .filter(col("bloom_hit")).collect().map(_.getLong(0)).toSet
    assert(survivors == verdicts)
    assert(built.toSet.subsetOf(survivors), "a true member was pruned")
    assert(pruned.columns.toSeq == Seq("v", "payload"), "helper columns must not leak")
    // the word-table BUILD owns its groupBy exchange; pruning must add
    // ZERO beyond it — the fact side never hash-shuffles. Fresh
    // (unexecuted) plans: an executed AQE plan string repeats stages.
    val plan = Sketches.bloomPrune(words, facts, col("v"), 4096, 4)
      .queryExecution.executedPlan.toString
    val pruneEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    val buildEx = "Exchange hashpartitioning".r.findAllIn(
      Sketches.bloomWords(built.toDF("v"), col("v"), 4096, 4)
        .queryExecution.executedPlan.toString).length
    assert(pruneEx == buildEx,
      s"bloom prune added ${pruneEx - buildEx} hash exchange(s) over the sketch build:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"bitmap must arrive by broadcast:\n$plan")
    // empty bloom prunes everything
    val empty = Sketches.bloomWords(Seq.empty[Long].toDF("v"), col("v"), 4096, 4)
    assert(Sketches.bloomPrune(empty, facts, col("v"), 4096, 4).count() == 0)
  }

  test("bloom: parameter validation") {
    val s = spark; import s.implicits._
    val df = Seq(1L).toDF("v")
    intercept[IllegalArgumentException] {
      Sketches.bloomWords(df, col("v"), 1000, 4) // not a power of two
    }
    intercept[IllegalArgumentException] {
      Sketches.bloomProbe(df, df, col("v"), 4096, 9)
    }
  }

  test("hllRolling: window=1 equals per-period hllDistinct; windows carry forward") {
    val s = spark; import s.implicits._
    // users 1-40 active on day 0; 41-60 on day 2; nothing on day 1
    val df = ((1L to 40L).map(u => (0L, u)) ++ (41L to 60L).map(u => (2L, u)))
      .toDF("day", "uid")
    val w1 = Sketches.hllRolling(df, col("day"), col("uid"), 1, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val per = Sketches.hllDistinct(df, Seq("day"), col("uid"), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w1 == per, "window=1 must degenerate to the per-period sketch")
    // window=3: day 2 sees day 0's users (within trailing 3 days) →
    // its registers are the union merge; day 1 has no row (unobserved)
    val w3 = Sketches.hllRolling(df, col("day"), col("uid"), 3, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w3.keySet == Set(0L, 2L), "only observed periods appear")
    assert(w3(0L) == per(0L), "day 0 trailing window contains only day 0")
    val union = Sketches.hllDistinct(df.select(lit(9L).as("day"), col("uid")),
      Seq("day"), col("uid"), 4).collect()(0).getLong(1)
    assert(w3(2L) == union, "day 2 trailing-3 must equal the 2-day union sketch")
    // p = 4 keeps n = 60 in the raw estimator's n ≳ 3·m regime
    assert(math.abs(w3(2L) - 60.0) / 60.0 < 0.5)
    intercept[IllegalArgumentException] {
      Sketches.hllRolling(df, col("day"), col("uid"), 0, 4)
    }
  }

  test("hllOverlapPairs: identical sets give union==parts, overlap==est") {
    val s = spark; import s.implicits._
    val vals = (0 until 600).map(i => s"tok$i")
    val df = (vals.map(("a", _)) ++ vals.map(("b", _))).toDF("src", "v")
    val r = Sketches.hllOverlapPairs(df, "src", col("v"), p = 7).head()
    val (ea, eb, eu, eo) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(ea == eb && eu == ea && eo == ea)  // same registers everywhere
    // raw HLL at p=7 on 600 distinct: within ~3 sigma of truth
    assert(math.abs(ea - 600) < 600 * 0.30, s"est=$ea")
    spark.catalog.clearCache()
  }

  test("hllOverlapPairs: disjoint sets estimate near-zero overlap") {
    val s = spark; import s.implicits._
    val df = ((0 until 800).map(i => ("a", s"left$i")) ++
      (0 until 800).map(i => ("b", s"right$i"))).toDF("src", "v")
    val r = Sketches.hllOverlapPairs(df, "src", col("v"), p = 7).head()
    val (ea, eb, eu, eo) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(eu > ea && eu > eb)           // union strictly bigger
    assert(eo < 800 * 0.25, s"overlap=$eo") // sketch noise only
    spark.catalog.clearCache()
  }


  test("hllCalibrationReport: exact vs estimate with signed ppm error") {
    val s = spark; import s.implicits._
    val df = (0 until 900).map(i => ("g", s"v$i")).toDF("grp", "v")
    val r = Sketches.hllCalibrationReport(df, "grp", col("v"), p = 7).head()
    val (exact, est, err) = (r.getLong(1), r.getLong(2), r.getLong(3))
    assert(exact == 900L)
    assert(math.abs(est - 900) < 900 * 0.30, s"est=$est")
    assert(err == (est - 900) * 1000000L / 900L)
    spark.catalog.clearCache()
  }

  test("cmsJoinSize: upper-bounds the exact join size, tight on few keys") {
    val s = spark; import s.implicits._
    // key k repeated f(k) times: f = {a:10, b:5, c:1} on side A,
    // {a:3, b:7, d:2} on side B -> exact join = 10*3 + 5*7 = 65
    def side(fs: Seq[(String, Int)]) =
      fs.flatMap { case (k, n) => Seq.fill(n)(k) }.toDF("k")
    val a = side(Seq("a" -> 10, "b" -> 5, "c" -> 1))
    val b = side(Seq("a" -> 3, "b" -> 7, "d" -> 2))
    val est = Sketches.cmsJoinSize(a, "k", b, "k", d = 4, w = 256)
      .head().getLong(0)
    // CMS inner product is one-sided: est >= exact, and with 4 keys in
    // 256 buckets collisions are unlikely -> equality here
    assert(est >= 65L && est <= 80L, s"est $est vs exact 65")
    // self-join of a: 100 + 25 + 1 = 126
    val self = Sketches.cmsJoinSize(a, "k", a, "k", d = 4, w = 256)
      .head().getLong(0)
    assert(self >= 126L && self <= 150L, s"self $self vs exact 126")
    // Fully DISJOINT key sets: every hash row with zero shared cells
    // must contribute a dot of 0 via the spine left-join — estimate is
    // exactly 0, not NULL (min over empty) or a collision overestimate.
    val disjoint = Sketches.cmsJoinSize(a, "k",
      side(Seq("x" -> 4, "y" -> 9)), "k", d = 4, w = 256)
      .head()
    assert(!disjoint.isNullAt(0) && disjoint.getLong(0) == 0L,
      s"disjoint est ${disjoint}")
  }

}
