package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable sketch operators — the fixed-memory summaries a 100 TB
  * pipeline keeps instead of exact state: HyperLogLog registers for
  * distinct counts (reference counts distincts exactly in gold marts,
  * e.g. `/root/reference/analytics/dbt/ecom_analytics/models/marts/
  * fct_sales_minute.sql`; at petabyte grain the sketch replaces the
  * exact `COUNT(DISTINCT)`), and a count-min sketch for frequency /
  * heavy-hitter estimates over unbounded token streams.
  *
  * Both sketches here are DETERMINISTIC variants: every hash is an
  * md5-derived 60-bit integer (the repo-wide cross-engine recipe, see
  * [[graft.ml.Sampling.tokenBudgetSample]]) and every estimator is pure
  * integer arithmetic, so a DuckDB oracle replays register tables,
  * counters and estimates bit-for-bit. Production HLL implementations
  * use float harmonic means; a float fold over registers would be
  * partition-order-dependent in the last ULP, so the estimator below
  * fixes the fraction 2^-M as the integer `2^40 >> M` and the bias
  * constant alpha_m = 0.7213/(1 + 1.079/m) as the integer ratio
  * `7213·m³ div (10000·m + 10790)` — same estimate in any engine, on
  * any partitioning, at a precision far below the sketch's own ±1.04/√m
  * standard error.
  *
  * Why these are the scale path: registers/counters are FIXED SIZE
  * (m rows per group; d·w rows total), merge by element-wise max/sum —
  * so shards sketch independently and a tiny final reduce combines
  * them, the exact shape `sbt`-tested in SketchesSpec (merge ≡ whole-
  * corpus sketch). No shuffle ever carries more than the sketch.
  */
object Sketches {

  /** 60-bit non-negative hash of `c` (15 md5 hex chars), salted.
    * DuckDB replays it as `('0x' || substr(md5(salt || c), 1, 15))::BIGINT`.
    */
  private def hash60(c: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), c.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /** HLL register table: one row per (group, bucket) with the max rank
    * rho = leading-zeros-of-suffix + 1. `p` register-index bits (m = 2^p
    * registers); the remaining 60−p hash bits feed rho, so rho ∈
    * [1, 61−p]. Registers are the MERGEABLE form — union register tables
    * and take `max(max_rho)` per bucket ([[hllMerge]]) to sketch a union
    * of shards without touching rows again.
    *
    * Cross-engine: bit-length via `length(ltrim(bin(suffix), '0'))` —
    * both engines render minimal binary strings (Spark `bin(0)` = "0",
    * DuckDB `bin(0)` = "0"; ltrim maps both to "", giving rho = 61−p for
    * the all-zero suffix, the textbook convention).
    */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valueCol: Column,
                   p: Int, salt: String = "hll-"): DataFrame = {
    require(p >= 4 && p <= 11,
      s"hllRegisters: p in [4, 11] (m = 16..2048; p > 11 overflows the " +
        s"fixed-point estimator's long numerator), got $p")
    val m = 1L << p
    val h = hash60(valueCol, salt)
    df.select(groupCols.map(col) :+ h.as("__h"): _*)
      .withColumn("bucket", col("__h").bitwiseAND(lit(m - 1L)))
      .withColumn("__suffix", shiftright(col("__h"), p))
      .withColumn("__rho",
        lit(61 - p) - length(expr("trim(LEADING '0' FROM bin(__suffix))")))
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("__rho")).cast("int").as("max_rho"))
  }

  /** Merge two register tables over the same (groupCols, p): element-wise
    * max. The 100 TB contract: sketch shards independently, merge the
    * m-row summaries.
    */
  def hllMerge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("max_rho")).cast("int").as("max_rho"))

  /** Raw-HLL estimate from a register table: one BIGINT per group.
    *
    *   Z_fp  = Σ_present (2^40 >> max_rho) + (m − present)·2^40
    *   est   = (alpha_fp · 2^40) div max(Z_fp, 1)
    *   alpha_fp = 7213·m³ div (10000·m + 10790)
    *
    * All longs: Z_fp ≤ m·2^40 ≤ 2^51, alpha_fp·2^40 ≤ 3.4e18 at p = 11.
    * This is the RAW estimator (no small-range linear-counting switch):
    * callers should size p so n ≳ 3·m, where its relative error is the
    * standard 1.04/√m (±2.3% at p = 11). Empty groups never appear
    * (no rows → no registers); a group with rows always has ≥ 1 register.
    */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String],
                  p: Int): DataFrame = {
    require(p >= 4 && p <= 11, s"hllEstimate: p in [4, 11], got $p")
    val m = 1L << p
    val alphaFp = 7213L * m * m * m / (10000L * m + 10790L)
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(expr(s"shiftright(CAST(${1L << 40} AS BIGINT), max_rho)"))
          .as("__present_sum"),
        count(lit(1)).as("__present"))
      .withColumn("__z_fp",
        col("__present_sum") + (lit(m) - col("__present")) * lit(1L << 40))
      .select(groupCols.map(col) :+
        expr(s"CAST(${alphaFp * (1L << 40)} AS BIGINT) div " +
          s"greatest(__z_fp, CAST(1 AS BIGINT))").as("est_distinct"): _*)
  }

  /** [[hllEstimate]] with Flajolet's small-range correction — the
    * estimator a PROFILER wants: when the raw estimate falls in the
    * small-cardinality regime (raw ≤ 2.5·m with empty registers left),
    * switch to linear counting est = m·ln(m/V) over the V empty
    * registers, which is accurate down to n = 1 where raw HLL
    * overestimates by an order of magnitude (a 3-value status column
    * reads ~200 under raw at p = 8, 3 under this).
    *
    * Cross-engine hash stability without query-time libm: V only takes
    * m+1 values, so the ln is PRECOMPUTED into an (m+1)-entry integer
    * lookup (round(m·ln(m/V)) evaluated once at plan-build time) and
    * embedded as an array literal — the oracle embeds the same literals,
    * making both engines exact by construction ([[hllCalibrationReport]]'s
    * determinism contract, extended to the corrected range).
    */
  def hllEstimateCorrected(registers: DataFrame, groupCols: Seq[String],
                           p: Int): DataFrame = {
    require(p >= 4 && p <= 11, s"hllEstimateCorrected: p in [4, 11], got $p")
    val m = 1L << p
    val lut = linearCountLut(p)
    hllEstimateRaw(registers, groupCols, p)
      .select(groupCols.map(col) :+
        when(col("__raw") <= lit(5L * m / 2) && col("__zeros") > 0,
          element_at(
            array(lut.map(lit): _*), col("__zeros").cast("int") + 1))
          .otherwise(col("__raw")).as("est_distinct"): _*)
  }

  /** The (m+1)-entry linear-counting table for [[hllEstimateCorrected]]:
    * entry V = round(m·ln(m/V)), entry 0 unused. Public so generated
    * oracles embed the identical literals.
    */
  def linearCountLut(p: Int): Seq[Long] = {
    val m = 1L << p
    (0L to m).map(v =>
      if (v == 0L) 0L else math.round(m * math.log(m.toDouble / v)))
  }

  /** Shared raw-estimator agg keeping the internals ([[hllEstimate]]'s
    * arithmetic plus the empty-register count) for correction layers.
    */
  private def hllEstimateRaw(registers: DataFrame, groupCols: Seq[String],
                             p: Int): DataFrame = {
    val m = 1L << p
    val alphaFp = 7213L * m * m * m / (10000L * m + 10790L)
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(expr(s"shiftright(CAST(${1L << 40} AS BIGINT), max_rho)"))
          .as("__present_sum"),
        count(lit(1)).as("__present"))
      .withColumn("__z_fp",
        col("__present_sum") + (lit(m) - col("__present")) * lit(1L << 40))
      .withColumn("__zeros", lit(m) - col("__present"))
      .withColumn("__raw",
        expr(s"CAST(${alphaFp * (1L << 40)} AS BIGINT) div " +
          s"greatest(__z_fp, CAST(1 AS BIGINT))"))
  }

  /** Trailing-window rolling distinct — the DAU→WAU/MAU metric family,
    * and the reason mergeable sketches exist: registers are built ONCE
    * per period, then every period's trailing estimate re-aggregates the
    * m-row summaries instead of re-scanning `window` periods of raw data.
    *
    * Mechanics: per-period registers ([[hllRegisters]] keyed by
    * `periodCol`, an integral period index such as epoch-days), each
    * register row exploded map-side to the `window` target periods it
    * contributes to, max-merged per (target, bucket) — [[hllMerge]]'s
    * element-wise max expressed as one agg — and estimated. Targets are
    * restricted to OBSERVED periods (broadcast semi join against the
    * period list): a period with no activity has no row, the same
    * "empty groups never appear" contract as [[hllEstimate]].
    *
    * Scale posture: raw data is touched once (the register agg); the
    * explode multiplies only the sketch table (≤ periods·m rows) by
    * `window`, and everything downstream is sketch-sized. At 100 TB the
    * alternative — `window` overlapping distinct-counts — re-shuffles
    * the fact table `window` times; this re-shuffles ~nothing.
    *
    * "Touched once" is guaranteed, not hoped for: `regs` feeds both the
    * merge branch and the observed-periods semi-join build side, so it
    * is persisted for the call (exchange reuse alone would break if AQE
    * replans one branch). Sketch-sized (≤ periods·2^p rows) — the usual
    * per-call lifecycle: the session owner's `clearCache()` releases it.
    */
  def hllRolling(df: DataFrame, periodCol: Column, valueCol: Column,
                 window: Int, p: Int, salt: String = "hll-"): DataFrame = {
    require(window >= 1, s"hllRolling: window >= 1, got $window")
    val regs = hllRegisters(df.select(periodCol.as("period"),
      valueCol.as("__v")), Seq("period"), col("__v"), p, salt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val periods = regs.select(col("period")).distinct()
    val merged = regs
      .withColumn("__target", explode(sequence(col("period"),
        col("period") + (window - 1))))
      .groupBy(col("__target"), col("bucket"))
      .agg(max(col("max_rho")).cast("int").as("max_rho"))
      .join(periods.withColumnRenamed("period", "__target"),
        Seq("__target"), "left_semi")
      .withColumnRenamed("__target", "period")
    hllEstimate(merged, Seq("period"), p)
  }

  /** Registers + estimate in one call — the `approx_count_distinct`
    * drop-in with a replayable oracle.
    */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], valueCol: Column,
                  p: Int, salt: String = "hll-"): DataFrame =
    hllEstimate(hllRegisters(df, groupCols, valueCol, p, salt), groupCols, p)

  /** Sketch-calibration report — exact distinct vs the HLL estimate per
    * group with the SIGNED ppm error: the "can I trust p=this for that
    * column" audit a team runs once per domain before swapping
    * `COUNT(DISTINCT)` for the sketch in production dashboards. Runs the
    * exact count (the thing you can only afford at audit time) and
    * [[hllDistinct]] over the same rows; both branches re-scan the input
    * (an audit-time cost by definition — production runs only the
    * sketch).
    *
    * Output: (group, exact_distinct, est_distinct, err_fp) with err_fp =
    * (est − exact)·10⁶ div exact, truncation toward zero (both engines).
    */
  def hllCalibrationReport(df: DataFrame, groupCol: String, valueCol: Column,
                           p: Int, salt: String = "hll-"): DataFrame = {
    val exact = df.select(col(groupCol).as("group"), valueCol.as("__v"))
      .groupBy(col("group"))
      .agg(countDistinct(col("__v")).as("exact_distinct"))
    val est = hllDistinct(df.select(col(groupCol), valueCol.as("__v")),
      Seq(groupCol), col("__v"), p, salt)
      .select(col(groupCol).as("group"), col("est_distinct"))
    exact.join(est, Seq("group"))
      .select(col("group"), col("exact_distinct"), col("est_distinct"),
        expr("((est_distinct - exact_distinct) * CAST(1000000 AS BIGINT))" +
          " div exact_distinct").as("err_fp"))
  }

  /** Pairwise sketch-based overlap between groups — "how much vocabulary
    * do these two sources share", the dataset-card dedup-pressure signal,
    * via inclusion–exclusion over HLL unions:
    *   |A ∩ B| ≈ est(A) + est(B) − est(A ∪ B),
    * where est(A ∪ B) comes from the element-wise max of the two register
    * tables ([[hllMerge]]) — no row of raw data is ever revisited.
    *
    * Scale posture: the raw data is scanned ONCE into per-group registers
    * (persisted for the call — sketch-sized, ≤ |groups|·2^p rows); all
    * pairing happens on sketches, so the pair stage costs |groups|²·2^p
    * register rows, independent of corpus size. The group-pair spine is a
    * deliberate bounded |groups|² product of the per-group estimates (the
    * q92 bounded-grid pattern). Inclusion–exclusion over raw estimates can
    * go slightly negative — clamped at 0 (the estimator contract: size p
    * so n ≳ 3·2^p per group).
    *
    * The register table is persisted for the call (it feeds the per-group
    * estimates and both sides of the pair merge; without the persist, any
    * replan re-scans raw data once per branch) and is sketch-sized — the
    * [[hllRolling]] per-call lifecycle: the session owner's `clearCache()`
    * releases it.
    *
    * Output: (source_a, source_b, est_a, est_b, est_union, est_overlap)
    * with source_a < source_b.
    */
  def hllOverlapPairs(df: DataFrame, groupCol: String, valueCol: Column,
                      p: Int, salt: String = "hll-"): DataFrame = {
    val regs = hllRegisters(df, Seq(groupCol), valueCol, p, salt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val est = hllEstimate(regs, Seq(groupCol), p)
    val pairs = est
      .select(col(groupCol).as("source_a"), col("est_distinct").as("est_a"))
      .join(est.select(col(groupCol).as("source_b"),
        col("est_distinct").as("est_b")), col("source_a") < col("source_b"))
    val keyA = pairs.select(col("source_a"), col("source_b"))
    val union = regs.join(keyA, col(groupCol) === col("source_a"))
      .select(col("source_a"), col("source_b"), col("bucket"), col("max_rho"))
      .unionByName(regs.join(keyA, col(groupCol) === col("source_b"))
        .select(col("source_a"), col("source_b"), col("bucket"),
          col("max_rho")))
      .groupBy(col("source_a"), col("source_b"), col("bucket"))
      .agg(max(col("max_rho")).cast("int").as("max_rho"))
    val out = pairs
      .join(hllEstimate(union, Seq("source_a", "source_b"), p)
        .withColumnRenamed("est_distinct", "est_union"),
        Seq("source_a", "source_b"))
      .select(col("source_a"), col("source_b"), col("est_a"), col("est_b"),
        col("est_union"),
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L))
          .as("est_overlap"))
    out
  }

  /** Count-min sketch over a token column: d independent hash rows × w
    * counters (w a power of two), counting total occurrences. The sketch
    * is d·w rows no matter the corpus — THE fixed-memory frequency
    * summary — and merges across shards by cell-wise `sum` (same
    * (hash_row, bucket) grid, checked in SketchesSpec).
    *
    * Scale posture: one map-side-combinable groupBy on (hash_row,
    * bucket); the exploded token stream never carries more than a long
    * pair per row.
    */
  def cmsSketch(tokens: DataFrame, tokenCol: String, d: Int, w: Int,
                salt: String = "cms-"): DataFrame = {
    require(d >= 1 && d <= 8, s"cmsSketch: d in [1, 8], got $d")
    require(w >= 2 && (w & (w - 1)) == 0, s"cmsSketch: w a power of two, got $w")
    tokens
      .select(posexplode(array((0 until d).map(i =>
        hash60(col(tokenCol), s"$salt$i-").bitwiseAND(lit(w - 1L))): _*))
        .as(Seq("hash_row", "bucket")))
      .groupBy(col("hash_row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Join-cardinality estimate from two count-min sketches — the
    * planner primitive (AMS/CMS inner product, Alon–Matias–Szegedy '96 /
    * Cormode–Muthukrishnan '05): |A ⋈ B| on a key = Σ_k f_A(k)·f_B(k),
    * and the per-hash-row dot product of two CMS arrays OVERESTIMATES
    * that sum by only the colliding mass, so min over the d rows is the
    * standard one-sided estimate. Answers "will this join blow up" (the
    * skew-key self-join case especially) from two d·w summaries without
    * touching either table again — sketches are mergeable across shards,
    * so at 100 TB each side ships d·w counters, not rows.
    *
    * Exact integer arithmetic (counts are longs, dot products
    * DECIMAL(38,0)), md5-derived buckets — hash-gated cross-engine
    * (q234). Output is ONE row: (est_join_rows).
    */
  def cmsJoinSize(a: DataFrame, aKey: String, b: DataFrame, bKey: String,
                  d: Int, w: Int, salt: String = "cms-"): DataFrame = {
    val sa = cmsSketch(a.select(col(aKey).cast("string").as("__t")), "__t",
      d, w, salt)
    val sb = cmsSketch(b.select(col(bKey).cast("string").as("__t")), "__t",
      d, w, salt)
    // Left-join the dots onto a d-row spine: a hash row whose cell sets
    // are fully disjoint has NO inner-join rows, and dropping it from
    // the min turns "estimate 0" into an overestimate (or a NULL min
    // when every row is disjoint). With the spine each of the d rows
    // contributes a dot of 0 when nothing overlaps, so disjoint key
    // sets estimate 0 exactly.
    val spine = a.sparkSession.range(d)
      .select(col("id").cast("int").as("hash_row"))
    val dots = sa
      .join(sb.withColumnRenamed("cnt", "cnt_b"), Seq("hash_row", "bucket"))
      .groupBy(col("hash_row"))
      .agg(sum(col("cnt").cast("decimal(38,0)") * col("cnt_b")).as("__dot"))
    spine.join(dots, Seq("hash_row"), "left")
      .agg(min(coalesce(col("__dot"), lit(0).cast("decimal(38,0)")))
        .as("__est"))
      .select(expr("CAST(__est AS BIGINT)").as("est_join_rows"))
  }

  /** Point estimates for `candidates` (distinct values of `tokenCol`)
    * against a sketch: est(t) = min over the d rows of the counter at
    * t's bucket — the classic one-sided estimator (est ≥ true count,
    * overshoot bounded by colliding mass). The sketch side is tiny
    * (d·w rows) and broadcast; candidates never shuffle.
    */
  def cmsEstimates(sketch: DataFrame, candidates: DataFrame, tokenCol: String,
                   d: Int, w: Int, salt: String = "cms-"): DataFrame = {
    require(d >= 1 && d <= 8 && w >= 2 && (w & (w - 1)) == 0,
      s"cmsEstimates: d in [1, 8], w a power of two, got d=$d w=$w")
    candidates
      .select(col(tokenCol), posexplode(array((0 until d).map(i =>
        hash60(col(tokenCol), s"$salt$i-").bitwiseAND(lit(w - 1L))): _*))
        .as(Seq("hash_row", "bucket")))
      .join(broadcast(sketch), Seq("hash_row", "bucket"))
      .groupBy(col(tokenCol))
      .agg(min(col("cnt")).as("est_count"))
  }

  /** Bloom filter as a distributed bitmap: `mBits` bits stored as
    * 32-bit words in an (word_idx, word) table of mBits/32 rows — the
    * join-pruning primitive (build over the dimension's join keys, probe
    * the fact side BEFORE its shuffle; Spark's own runtime row-level
    * filtering does exactly this internally). 32-bit words in a long
    * keep every shift/or in non-negative territory — identical
    * two's-complement-free arithmetic in any engine.
    *
    * Mergeable like the other sketches: bit_or word tables of shards
    * ([[bloomMerge]]) — union build sets without re-reading them.
    */
  def bloomWords(df: DataFrame, valueCol: Column, mBits: Int, k: Int,
                 salt: String = "bloom-"): DataFrame = {
    require(mBits >= 32 && (mBits & (mBits - 1)) == 0,
      s"bloomWords: mBits a power of two >= 32, got $mBits")
    require(k >= 1 && k <= 8, s"bloomWords: k in [1, 8], got $k")
    df.select(explode(array((0 until k).map(i =>
        hash60(valueCol, s"$salt$i-").bitwiseAND(lit(mBits - 1L))): _*))
        .as("__p"))
      .groupBy(shiftright(col("__p"), 5).as("word_idx"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST((__p & 31) AS INT)))")
        .as("word"))
  }

  /** Merge bloom word tables (same mBits/k/salt): bit_or per word. */
  def bloomMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("word_idx"))
      .agg(expr("bit_or(word)").as("word"))

  /** Probe: one row per DISTINCT candidate value with `bloom_hit` =
    * every one of its k bits set (no false negatives; false positives
    * at the standard (1−e^(−kn/m))^k rate, deterministic here because
    * the hashes are). The word table is tiny (mBits/32 rows) and
    * broadcast — probing never shuffles the candidate side, which is
    * the entire point of bloom-pruning a fact table before its join
    * exchange.
    */
  def bloomProbe(words: DataFrame, candidates: DataFrame, valueCol: Column,
                 mBits: Int, k: Int, salt: String = "bloom-"): DataFrame = {
    require(mBits >= 32 && (mBits & (mBits - 1)) == 0 && k >= 1 && k <= 8,
      s"bloomProbe: mBits a power of two >= 32, k in [1, 8], got m=$mBits k=$k")
    candidates
      .select(valueCol.as("value"), explode(array((0 until k).map(i =>
        hash60(valueCol, s"$salt$i-").bitwiseAND(lit(mBits - 1L))): _*))
        .as("__p"))
      .join(broadcast(words),
        shiftright(col("__p"), 5) === words("word_idx"), "left")
      .groupBy(col("value"))
      .agg((min(coalesce(
        expr("shiftright(word, CAST((__p & 31) AS INT)) & 1"), lit(0L))) === 1L)
        .as("bloom_hit"))
  }

  /** Row-local bloom PRUNE — the shape that actually cuts a 100 TB
    * join: fold the word table into ONE map row, broadcast it, and
    * filter the fact side in place. Unlike [[bloomProbe]] (which builds
    * a per-distinct-value verdict table through an aggregation
    * exchange), the fact table here never shuffles at all — its rows
    * pass or die inside the scan stage, BEFORE the join exchange the
    * filter exists to shrink (spec asserts zero hash exchanges in the
    * plan). No false negatives, so the downstream exact join sees every
    * true match; false positives just ride along and fall out there.
    */
  def bloomPrune(words: DataFrame, df: DataFrame, valueCol: Column,
                 mBits: Int, k: Int, salt: String = "bloom-"): DataFrame = {
    require(mBits >= 32 && (mBits & (mBits - 1)) == 0 && k >= 1 && k <= 8,
      s"bloomPrune: mBits a power of two >= 32, k in [1, 8], got m=$mBits k=$k")
    val bitmap = words.agg(map_from_entries(
      collect_list(struct(col("word_idx"), col("word")))).as("__bloom"))
    df
      .withColumn("__ps", array((0 until k).map(i =>
        hash60(valueCol, s"$salt$i-").bitwiseAND(lit(mBits - 1L))): _*))
      .crossJoin(broadcast(bitmap))
      // try_element_at: a word with no set bits is absent from the map —
      // that's a miss, not an error (ANSI element_at would throw).
      .filter(expr("forall(__ps, p -> (shiftright(coalesce(" +
        "try_element_at(__bloom, p div 32), CAST(0 AS BIGINT)), " +
        "CAST(p % 32 AS INT)) & 1) = 1)"))
      .drop("__ps", "__bloom")
  }

  /** Fixed-bin histogram sketch — the quantile member of the sketch
    * family (distinct = HLL, frequency = count-min, membership = bloom).
    * `bins` equal-width buckets over the LONG range [lo, hi); values
    * outside clamp into the edge bins (standard histogram-sketch
    * convention — the tails stay visible without unbounded range). One
    * map-side-combinable groupBy; ≤ bins rows per group regardless of
    * data size; shards merge by per-bin count sum ([[histMerge]]).
    *
    * All arithmetic is integer (`(v − lo) · bins div (hi − lo)`), so the
    * oracle replays bins, counts and quantiles exactly — unlike
    * KLL/t-digest, whose float merge order would be partitioning-
    * dependent. The price is fixed resolution: quantile error ≤ one bin
    * width, chosen up front.
    */
  def histSketch(df: DataFrame, groupCols: Seq[String], valueCol: Column,
                 lo: Long, hi: Long, bins: Int): DataFrame = {
    require(bins >= 2 && bins <= (1 << 20), s"histSketch: bins in [2, 2^20], got $bins")
    require(lo < hi, s"histSketch: lo < hi, got [$lo, $hi)")
    // Overflow contract (ANSI makes a breach loud): (v − lo) · bins must
    // fit a long — at bins ≤ 2^20 that allows value ranges up to ~2^43.
    df.select(groupCols.map(col) :+
        ((valueCol.cast("long") - lit(lo)) * lit(bins.toLong)).as("__num"): _*)
      .withColumn("bin", least(greatest(
        expr(s"__num div ${hi - lo}L"), lit(0L)), lit(bins - 1L)))
      .groupBy(groupCols.map(col) :+ col("bin"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge histogram sketches over the same (groupCols, lo, hi, bins):
    * per-bin count sum.
    */
  def histMerge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(groupCols.map(col) :+ col("bin"): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Quantiles from a histogram sketch: for each permille q in `qs`, the
    * first bin whose cumulative count reaches rank = ceil(q·N/1000) —
    * i.e. the bin CONTAINING the exact q-quantile, with its [bin_lo,
    * bin_hi) value bounds. Integer ranks, shared per-group cumsum sort;
    * group cardinality is sketch-sized (≤ bins rows), so the windows are
    * trivial at any corpus scale.
    *
    * One pass for ALL requested quantiles: the first bin reaching rank r
    * is exactly the bin with cum ≥ r AND cum − cnt < r (the previous
    * cumulative hadn't reached it; sketch rows all have cnt > 0), so an
    * explode of the q list plus that row-local predicate selects every
    * quantile bin without re-evaluating the upstream plan per q — the
    * per-q filter/groupBy/union of the original formulation recomputed
    * the sketch (scan + both window passes) once per requested quantile.
    */
  def histQuantiles(sketch: DataFrame, groupCols: Seq[String],
                    lo: Long, hi: Long, bins: Int, qs: Seq[Int]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 1 && q <= 1000),
      s"histQuantiles: permilles in [1, 1000], got $qs")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(col("bin").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
    sketch
      .withColumn("__cum", sum(col("cnt")).over(w))
      .withColumn("__n", sum(col("cnt")).over(wAll))
      .withColumn("q_permille",
        explode(array(qs.map(q => lit(q)): _*)))
      .withColumn("__rank", expr("(__n * q_permille + 999) div 1000"))
      .filter(col("__cum") >= col("__rank") &&
        col("__cum") - col("cnt") < col("__rank"))
      .withColumn("bin_lo",
        lit(lo) + expr(s"bin * ${hi - lo}L div ${bins}L"))
      .withColumn("bin_hi",
        lit(lo) + expr(s"(bin + 1) * ${hi - lo}L div ${bins}L"))
      .select(groupCols.map(col) ++ Seq(col("q_permille"), col("bin"),
        col("bin_lo"), col("bin_hi")): _*)
  }

  /** Heavy hitters: sketch a token-occurrence stream (one row per
    * occurrence — build it with [[graft.text.TextDedup.shinglesAll]] for
    * n-grams), estimate every distinct token, keep the top `k` by
    * (est desc, token) — TakeOrdered (per-partition heap + driver merge
    * of k rows), never a global sort. In a streaming deployment the
    * candidate set is the keys seen in the current window; the sketch
    * itself never grows.
    */
  def cmsTopK(tokens: DataFrame, tokenCol: String, d: Int, w: Int,
              k: Int, salt: String = "cms-"): DataFrame = {
    require(k >= 1, s"cmsTopK: k >= 1, got $k")
    val sketch = cmsSketch(tokens, tokenCol, d, w, salt)
    cmsEstimates(sketch, tokens.select(col(tokenCol)).distinct(),
        tokenCol, d, w, salt)
      .orderBy(col("est_count").desc, col(tokenCol).asc)
      .limit(k)
  }
}
