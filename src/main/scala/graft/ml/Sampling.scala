package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting / packing for training-data curation.
  *
  * Everything here is driven by a salted md5 of a stable row id — never
  * `rand()` — so results are reproducible run-over-run, independent of
  * partitioning, and bit-identical in any engine that has md5 (the DuckDB
  * oracle reproduces every operator below). All operators are row-local or
  * single-shuffle; nothing funnels through the driver.
  */
object Sampling {

  /** Salted 60-bit md5 hash reduced mod `m` — uniform-enough buckets with a
    * cross-engine recipe: Spark `conv(substring(md5(s),1,15),16,10)` equals
    * DuckDB `('0x' || substr(md5(s),1,15))::BIGINT` (TextDedup.tokenHash60
    * uses the same contract).
    */
  def hash60(id: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  def hashBucket(id: Column, salt: String, m: Int): Column = {
    require(m > 0, "hashBucket modulus must be positive")
    pmod(hash60(id, salt), lit(m.toLong))
  }

  /** Deterministic train/validation/test split: every row lands in exactly
    * one named split by its id's hash bucket (percents must sum to 100).
    * Membership is a pure function of the id — stable under reruns,
    * repartitioning, and incremental appends (a new row never moves an old
    * one), which is the property that keeps eval sets uncontaminated.
    * Adds `split_bucket` (0–99) and `split`.
    */
  def hashSplit(df: DataFrame, id: Column, salt: String,
                splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 100,
      s"split percents must sum to 100: $splits")
    require(splits.forall(_._2 > 0),
      s"split percents must be positive (negative values make the cut " +
        s"points non-monotonic and silently misassign rows): $splits")
    val b = hashBucket(id, salt, 100)
    val cuts = splits.scanLeft(0)(_ + _._2).tail
    val expr = splits.zip(cuts).init.foldRight(lit(splits.last._1)) {
      case (((name, _), cut), rest) => when(b < cut, name).otherwise(rest)
    }
    df.withColumn("split_bucket", b).withColumn("split", expr)
  }

  /** Dedup-aware train/test split — [[hashSplit]] with the leakage hole
    * closed: hashing DOC ids lets two near-duplicates straddle the
    * boundary (the classic eval contamination q158 audits AFTER the
    * fact); here every document is first labeled with its near-dup
    * cluster ([[graft.graphs.ConnectedComponents]] over the caller's
    * candidate-pair graph, min-id label; unpaired docs are their own
    * singleton component) and the hash is taken over the COMPONENT id —
    * a cluster lands in exactly one split by construction, so the test
    * set never contains a near-copy of a training document.
    *
    * Scale posture: the pair graph is near-dup-output-sized (far smaller
    * than the corpus), the CC fixpoint is the co-partitioned RDD loop,
    * and the only corpus-sized work is one left join against the
    * node-sized component table plus the row-local hash.
    *
    * Output: (idCol, component_id, split) with split ∈ {test, train}.
    */
  def leakageSafeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
                       testPct: Int, salt: String = "split-"): DataFrame = {
    require(testPct >= 1 && testPct <= 99,
      s"leakageSafeSplit: testPct in [1, 99], got $testPct")
    val comps = graft.graphs.ConnectedComponents.run(pairs)
      .withColumnRenamed("node", idCol)
    docs.select(col(idCol))
      .join(comps, Seq(idCol), "left")
      .withColumn("component_id",
        coalesce(col("component"), col(idCol).cast("long")))
      .select(col(idCol), col("component_id"),
        when(hashBucket(col("component_id"), salt, 100) < testPct,
          lit("test")).otherwise(lit("train")).as("split"))
  }

  /** Deterministic stratified sample: the `n` rows of each stratum with the
    * smallest salted hash (id tiebreak), ranked 1..n as `sample_rank`.
    * Hash-ordering makes the sample uniform within the stratum yet stable
    * across runs.
    *
    * The hot-stratum guard is structural, not advisory: a single window
    * partitioned by the strata would funnel each stratum through ONE
    * task's sort — fatal when a stratum holds a large fraction of a 100 TB
    * corpus. Instead the salted two-stage top-k idiom (same as
    * Similarity.topKPerKey): a partial window over (strata, hash-salt
    * bucket) keeps each bucket's top n, then the final per-stratum window
    * ranks at most `saltBuckets · n` survivors — per-task input is bounded
    * by construction, and the result is identical to the single-window
    * form because every stratum-wide top-n row is also in its own salt
    * bucket's top n.
    */
  def stratifiedSample(df: DataFrame, strata: Seq[String], id: Column,
                       n: Int, salt: String, saltBuckets: Int = 64): DataFrame = {
    require(strata.nonEmpty, "stratifiedSample needs stratum columns")
    require(n > 0, "stratifiedSample n must be positive")
    require(saltBuckets > 0, "stratifiedSample saltBuckets must be positive")
    val h = hash60(id, salt)
    val partial = Window
      .partitionBy(strata.map(col) :+ pmod(h, lit(saltBuckets.toLong)): _*)
      .orderBy(h.asc, id.asc)
    val fin = Window.partitionBy(strata.map(col): _*).orderBy(h.asc, id.asc)
    df.withColumn("__prank", row_number().over(partial))
      .filter(col("__prank") <= n).drop("__prank")
      .withColumn("sample_rank", row_number().over(fin))
      .filter(col("sample_rank") <= n)
  }

  /** Mixture re-weighting: keep each row with its stratum's percent
    * (unknown strata get `defaultPct`), decided by the id's hash bucket.
    * This is the dataset-mixing primitive (e.g. downsample crawl, keep all
    * curated) — row-local, no shuffle, deterministic. Adds `rate_pct`;
    * returns only kept rows.
    */
  def mixtureSample(df: DataFrame, stratum: Column, id: Column, salt: String,
                    pctByStratum: Seq[(String, Int)], defaultPct: Int): DataFrame = {
    require((defaultPct +: pctByStratum.map(_._2)).forall(p => p >= 0 && p <= 100),
      "percents must be within [0, 100]")
    val rate = pctByStratum.foldRight(lit(defaultPct)) {
      case ((name, pct), rest) => when(stratum === name, pct).otherwise(rest)
    }
    df.withColumn("rate_pct", rate)
      .filter(hashBucket(id, salt, 100) < col("rate_pct"))
  }

  /** Token-budget sampling: per group, keep documents in salted-hash order
    * (id tiebreak) while the group's running token total stays within
    * `budget` — the primitive behind token-budgeted dataset mixtures
    * ("200 B tokens of crawl, 30 B of code"), where doc-count caps are the
    * wrong unit. The kept set is the maximal hash-order PREFIX whose
    * inclusive token sum is ≤ budget (token counts must be ≥ 0, or the
    * running sum is non-monotone and the prefix property breaks). Adds
    * `budget_used` (the inclusive running total at the row); selection is
    * a pure function of (id, salt, tokenCol), reproducible cross-engine.
    *
    * Scale posture — distributed prefix sum, never one sort task per
    * group: a single `Window.partitionBy(group).orderBy(hash)` would
    * funnel each group (a 100 TB mixture has FEW groups, each huge)
    * through one task. Instead the hash space is cut into `rangeBuckets`
    * hash-RANGE buckets — `h div width`, which unlike `h mod m` is
    * order-aligned (h₁ < h₂ ⇒ bucket₁ ≤ bucket₂), so global hash order is
    * (bucket, h) — then: (1) a local cumsum within each (group, bucket);
    * (2) an exclusive scan over the per-bucket totals (≤ rangeBuckets tiny
    * rows per group); (3) a broadcastable join adds each bucket's offset
    * back. Per-task sort input is ~1/rangeBuckets of the group, and the
    * result is identical to the single-window form by the associativity of
    * the prefix sum.
    */
  def tokenBudgetSample(df: DataFrame, groupCols: Seq[String], id: Column,
                        tokenCol: String, budget: Long, salt: String,
                        rangeBuckets: Int = 64): DataFrame = {
    require(groupCols.nonEmpty, "tokenBudgetSample needs grouping columns")
    require(budget >= 0, s"tokenBudgetSample budget must be >= 0: $budget")
    require(rangeBuckets > 0,
      s"tokenBudgetSample rangeBuckets must be positive: $rangeBuckets")
    val width = (1L << 60) / rangeBuckets + 1 // h in [0, 2^60): order-aligned cut
    val local = Window
      .partitionBy((groupCols.map(col) :+ col("__rb")): _*)
      .orderBy(col("__h").asc, id.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val staged = df
      .withColumn("__h", hash60(id, salt))
      .withColumn("__rb", expr(s"__h div $width"))
      .withColumn("__lcum", sum(col(tokenCol).cast("long")).over(local))
    val scan = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__rb").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = staged
      .groupBy((groupCols.map(col) :+ col("__rb")): _*)
      .agg(sum(col(tokenCol).cast("long")).as("__btot"))
      .withColumn("__off", coalesce(sum(col("__btot")).over(scan), lit(0L)))
      .select((groupCols.map(col) :+ col("__rb") :+ col("__off")): _*)
    staged.join(broadcast(offsets), groupCols :+ "__rb")
      .withColumn("budget_used", col("__lcum") + col("__off"))
      .filter(col("budget_used") <= budget)
      .drop("__h", "__rb", "__lcum", "__off")
  }

  /** Deterministic weighted sampling without replacement — sequential
    * Poisson sampling (Ohlsson): per group keep the `k` rows with the
    * smallest priority q = u / w, u uniform. Here u is the salted 60-bit
    * hash and the priority is the integer `h div max(w, 1)` — order-
    * equivalent to u/w at weight resolution, reproducible run-over-run
    * and engine-over-engine (the oracle replays priorities AND ranks).
    * Heavier rows draw stochastically smaller priorities, so inclusion
    * probability grows ∝ weight — the mixture-reweighting primitive when
    * the unit is rows, not tokens ([[tokenBudgetSample]] is the
    * token-unit sibling).
    *
    * Scale posture: the per-group top-k goes through
    * [[Similarity.topKPerKey]] — a salted partial top-k bounds any
    * single reducer at saltBuckets·k rows, so a giant group never
    * funnels through one task. Adds `priority` and `rank` (1..k).
    */
  def weightedSample(df: DataFrame, groupCols: Seq[String], id: Column,
                     weightCol: String, k: Int, salt: String): DataFrame = {
    require(groupCols.nonEmpty, "weightedSample needs grouping columns")
    require(k >= 1, s"weightedSample k must be >= 1: $k")
    val staged = df
      .withColumn("__h", hash60(id, salt))
      .withColumn("priority",
        expr(s"__h div greatest(CAST($weightCol AS BIGINT), CAST(1 AS BIGINT))"))
    Similarity.topKPerKey(staged,
        struct(groupCols.map(col): _*),
        Seq(col("priority").asc, id.asc), k, col("__h"))
      .drop("__h")
  }

  /** Concat-then-chunk sequence packing (the GPT-style pretraining layout):
    * documents are laid head-to-tail per group in `orderCols` order, and
    * each document is tagged with the fixed-size sequence its first token
    * lands in. Adds:
    *   - `pack_offset`: the document's start position in the group's token
    *     stream (exclusive running sum of `tokenCol`);
    *   - `seq_idx` = pack_offset div budget, `seq_offset` = pack_offset mod
    *     budget — all exact integer arithmetic.
    * One shuffle on the group; the running sum is a per-group window. Use
    * groups (shard/source) to bound per-task stream length at corpus scale.
    */
  def packSequences(df: DataFrame, groupCols: Seq[String], orderCols: Seq[String],
                    tokenCol: String, budget: Int): DataFrame = {
    require(groupCols.nonEmpty, "packSequences needs grouping columns")
    require(budget > 0, "packSequences budget must be positive")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(orderCols.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("pack_offset",
        sum(col(tokenCol)).over(w) - col(tokenCol))
      .withColumn("seq_idx", expr(s"pack_offset div $budget"))
      .withColumn("seq_offset", pmod(col("pack_offset"), lit(budget.toLong)))
  }

  /** Split-leakage audit — the eval-hygiene check that makes
    * [[hashSplit]] trustworthy: exact splitting keeps a document on one
    * side, but its NEAR-DUPLICATES can land on the other, quietly
    * putting "test" content in the training set. Given a near-dup pair
    * graph (any of the TextDedup flavors) and a (id, split) assignment,
    * count pairs per unordered split combination — off-diagonal rows
    * ARE the leaks; `leaked = split_a <> split_b` flags them for a
    * gate.
    *
    * Two dimension-cheap joins (the split table rides the pair ids) and
    * one map-side-combinable count — the audit costs a fraction of the
    * dedup pass that produced the pairs.
    *
    * Output: (split_a, split_b, n_pairs, leaked), split_a <= split_b.
    */
  def splitLeakage(pairs: DataFrame, splits: DataFrame): DataFrame = {
    val s = splits.select(col("id").cast("long").as("__id"),
      col("split").as("__sp"))
    pairs
      .join(s.select(col("__id").as("doc_a"), col("__sp").as("__sa")), Seq("doc_a"))
      .join(s.select(col("__id").as("doc_b"), col("__sp").as("__sb")), Seq("doc_b"))
      .select(least(col("__sa"), col("__sb")).as("split_a"),
        greatest(col("__sa"), col("__sb")).as("split_b"))
      .groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("leaked", col("split_a") =!= col("split_b"))
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document
    * by how much its HASHED unigram profile looks like a target slice of
    * the corpus rather than the raw distribution. Each token hashes into
    * one of `buckets` md5 buckets (the [[hashBucket]] cross-engine
    * recipe); the per-bucket weight is the add-half-smoothed log-ratio
    *   w(b) = ln( ((ct+0.5)/(Tt+B/2)) / ((cr+0.5)/(Tr+B/2)) )
    * (ct/cr = target/raw occurrences of bucket b, Tt/Tr the totals), and
    * a document's score is the sum of its token occurrences' bucket
    * weights — the paper's log importance weight under a hashed n-gram
    * bag model. Documents scoring high are the ones importance
    * resampling keeps (feed `dsir_fp` to [[weightedSample]] /
    * [[Similarity.topKPerKey]] downstream).
    *
    * Cross-engine: each bucket weight is quantized ONCE to
    * floor(w·10⁶) — a long — so per-document sums are exact,
    * commutative, and partitioning-independent (the q84 contract); the
    * division sequence inside ln is written identically in the oracle.
    *
    * Scale posture: one token-bucket explode feeds a B-row
    * map-side-combinable conditional count; totals come from a window
    * over the BUCKET table (B rows, never the corpus); the scoring join
    * broadcasts the B-row weight table back onto the token stream. Two
    * corpus-sized stages total — the explode and the per-doc sum — both
    * combiner-friendly.
    *
    * Output: (doc_id, n_tokens, dsir_fp, avg_dsir).
    */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  targetPred: Column, buckets: Int = 1024,
                  salt: String = "dsir"): DataFrame = {
    require(buckets >= 2, s"dsirWeights buckets must be >= 2, got $buckets")
    // Tokenize once; the token table feeds the bucket counts and the
    // per-doc scoring sum (per-call persist lifecycle).
    val toks = docs.select(col(idCol).as("doc_id"),
        targetPred.as("__t"),
        explode(graft.text.TextDedup.tokens(col(textCol))).as("w"))
      .select(col("doc_id"), col("__t"),
        hashBucket(col("w"), salt, buckets).as("__b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val byBucket = toks.groupBy(col("__b"))
      .agg(count(lit(1)).as("__cr"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("__ct"))
    val tot = Window.partitionBy(lit(1))
    val wts = byBucket
      .withColumn("__tr", sum(col("__cr")).over(tot))
      .withColumn("__tt", sum(col("__ct")).over(tot))
      .select(col("__b"),
        floor(log(((col("__ct").cast("double") + lit(0.5))
            / (col("__tt").cast("double") + lit(buckets * 0.5)))
          / ((col("__cr").cast("double") + lit(0.5))
            / (col("__tr").cast("double") + lit(buckets * 0.5))))
          * lit(1000000.0)).as("__w"))
    toks.join(broadcast(wts), Seq("__b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__w")).as("dsir_fp"))
      .select(col("doc_id"), col("n_tokens"), col("dsir_fp"),
        ((col("dsir_fp") / lit(1000000.0)) / col("n_tokens"))
          .as("avg_dsir"))
  }

  /** Temperature-scaled mixture weights (the multilingual-LLM rebalancer,
    * XLM / mT5 style): sampling weight w_s ∝ c_s^α flattens the source
    * distribution so head sources stop drowning the tail. α is fixed at
    * ½ — the exact-arithmetic point of the usual 0.3–0.7 range, because
    * √ of an integer is an IEEE correctly-rounded double both engines
    * produce identically, where a general pow() is not.
    *
    * Determinism: each √count is quantized ONCE to 2^20 fixed point
    * (floor of an exact-scaled double — the q72/q84 contract), the
    * normalizer is an exact long sum over the |sources|-row table (a
    * single window, never the corpus), and the weight is integer
    * parts-per-million: w_fp = q_s · 10⁶ div Σq. The corpus is touched
    * once by the count aggregation; everything downstream is
    * dimension-sized.
    *
    * Output: (source, n_docs, weight_fp) — Σ weight_fp ≤ 10⁶ (floor
    * rounding), each weight the ppm sampling share for that source.
    */
  def temperatureWeights(df: DataFrame, groupCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol).as("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("__q",
        floor(sqrt(col("n_docs").cast("double")) * lit(1048576.0))
          .cast("long"))
    counts
      .withColumn("__tot", sum(col("__q")).over(Window.partitionBy(lit(1))))
      .select(col("source"), col("n_docs"),
        expr("(__q * CAST(1000000 AS BIGINT)) div __tot").as("weight_fp"))
  }

  /** Shannon entropy of the group-size mix per key — the dataset-card
    * "how diverse is this slice" number (entropy 0 = one group dominates
    * completely; ln(k) = perfectly even over k groups):
    *   H = ln N − (Σ_g c_g·ln c_g) / N.
    *
    * Determinism: each group's c·ln(c) term is quantized ONCE to 10⁻⁶
    * fixed point (the q84 log-prob contract — libm ln may differ by an
    * ulp between engines, but the floor of the scaled term is tie-free in
    * practice and any partitioning sums the same longs), the Σ/N division
    * is integer floor on non-negative operands, and ln(N) is quantized
    * the same way.
    *
    * Scale posture: one map-side-combinable count per (key, group), one
    * per-key reduction over group rows. Output: (key, n_rows, n_groups,
    * entropy_fp) — entropy in nats × 10⁶.
    */
  def mixtureEntropy(df: DataFrame, keyCol: String, groupCol: String): DataFrame =
    df.groupBy(col(keyCol).as("key"), col(groupCol).as("__g"))
      .agg(count(lit(1)).as("__c"))
      .select(col("key"), col("__c"),
        floor(col("__c").cast("double") * log(col("__c").cast("double"))
          * lit(1000000.0)).cast("long").as("__t"))
      .groupBy(col("key"))
      .agg(sum(col("__c")).as("n_rows"), count(lit(1)).as("n_groups"),
        sum(col("__t")).as("__s"))
      .select(col("key"), col("n_rows"), col("n_groups"),
        (floor(log(col("n_rows").cast("double")) * lit(1000000.0))
          .cast("long") - expr("__s div n_rows")).as("entropy_fp"))

  /** Quantile normalization of a score across sources — batch-effect
    * correction before a single global threshold: each row's score is
    * replaced by the GLOBAL score at the same quantile its rank occupies
    * within its source, so every source's distribution maps onto the
    * pooled one (the microarray-normalization idea applied to
    * heterogeneous quality scorers).
    *
    * Exact: within-source rank r of n maps to global target rank
    * ⌈r·N/n⌉ = (r·N + n − 1) div n (positive integer arithmetic), and the
    * normalized value is the global (score, source, id)-ranked value at
    * that rank — every rank carries the unique tiebreak.
    *
    * Shape: the ranked table is built ONCE (one global sort-exchange —
    * rank normalization is inherently a global order, the
    * [[graft.ml.Eval.calibrationBins]] trade; histogram-sketch cuts are
    * the approximate 100 TB alternative) and persisted, because it is
    * both the row set and the rank-lookup side of the final equi-join
    * (per-call lifecycle: session `clearCache()` releases it).
    *
    * Output: (source, id, score_fp, norm_fp).
    */
  def quantileNormalize(df: DataFrame, srcCol: String, idCol: String,
                        scoreFpCol: String): DataFrame = {
    val ranked = df
      .select(col(srcCol).as("source"), col(idCol).as("id"),
        col(scoreFpCol).cast("long").as("score_fp"))
      .withColumn("__g", row_number().over(
        Window.orderBy(col("score_fp").asc, col("source").asc,
          col("id").asc)).cast("long"))
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("score_fp").asc,
          col("id").asc)).cast("long"))
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy(col("source"))))
      .withColumn("__nn", count(lit(1)).over(Window.partitionBy(lit(1))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lookup = ranked.select(col("__g").as("__t"),
      col("score_fp").as("norm_fp"))
    ranked
      .withColumn("__t", expr("(__r * __nn + __n - 1) div __n"))
      .join(lookup, Seq("__t"))
      .select(col("source"), col("id"), col("score_fp"), col("norm_fp"))
  }
}
