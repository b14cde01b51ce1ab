package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier-evaluation aggregates — the quality-model QA suite a
  * curation pipeline runs before trusting a filter: threshold sweeps
  * (where do I cut?), chance-corrected agreement (is the cheap heuristic
  * as good as the labels?), and calibration (do scores MEAN anything?).
  * Every metric is computed from exact integer confusion counts, so the
  * numbers are bit-identical under any partitioning.
  */
object Eval {

  /** Precision/recall/F1 at each literal threshold: predict positive when
    * `scoreCol >= t`. Confusion counts are exact longs; the ratios are
    * integer parts-per-million (tp·10⁶ div …) — no float in the pipeline.
    * F1 folds to 2·tp·10⁶ div (2·tp + fp + fn), the same rational.
    *
    * Scale posture: each row fans out to |thresholds| (literal-bounded,
    * a dozen cuts — never data-sized) counting rows map-side, and the
    * reduction is one map-side-combinable agg over |thresholds| groups.
    * Thresholds with no positive predictions keep precision NULL (0/0).
    * Rows whose label is NULL are EXCLUDED up front (unlabeled rows can't
    * land in any confusion cell), so tp+fp+fn+tn always sums to the
    * labeled row count — never a silent partial denominator.
    *
    * Output: (threshold, tp, fp, fn, tn, precision_fp, recall_fp, f1_fp).
    */
  def thresholdSweep(df: DataFrame, scoreCol: String, labelCol: Column,
                     thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty && thresholds.distinct.size == thresholds.size,
      s"thresholdSweep needs distinct thresholds, got $thresholds")
    val M = 1000000L
    df.select(col(scoreCol).cast("long").as("__s"), labelCol.as("__l"))
      .filter(col("__l").isNotNull)
      .withColumn("threshold", explode(array(thresholds.map(lit): _*)))
      .groupBy(col("threshold"))
      .agg(
        sum(when(col("__s") >= col("threshold") && col("__l"), 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("__s") >= col("threshold") && !col("__l"), 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("__s") < col("threshold") && col("__l"), 1L)
          .otherwise(0L)).as("fn"),
        sum(when(col("__s") < col("threshold") && !col("__l"), 1L)
          .otherwise(0L)).as("tn"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"), col("tn"),
        when(col("tp") + col("fp") > 0,
          expr(s"(tp * CAST($M AS BIGINT)) div (tp + fp)")).as("precision_fp"),
        when(col("tp") + col("fn") > 0,
          expr(s"(tp * CAST($M AS BIGINT)) div (tp + fn)")).as("recall_fp"),
        when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
          expr(s"(2 * tp * CAST($M AS BIGINT)) div (2 * tp + fp + fn)"))
          .as("f1_fp"))
  }

  /** Cohen's kappa (1960) between two categorical columns — agreement
    * corrected for chance, the "is my cheap language-ID actually better
    * than guessing the majority class" check. From exact counts:
    *   κ = (N·Σᵢ nᵢᵢ − Σᵢ rᵢ·cᵢ) / (N² − Σᵢ rᵢ·cᵢ)
    * with rᵢ/cᵢ the per-class marginals — both numerator and denominator
    * are exact DECIMAL(38,0) integers (N² overflows longs at ~3·10⁹
    * rows), and the final division is the one IEEE op, identical in both
    * engines from identical integers.
    *
    * Scale posture: one pass to the |classes|²-bounded confusion table,
    * everything after is confusion-table-sized. Output is ONE row:
    * (n_rows, n_agree, po_fp, pe_fp, kappa).
    */
  def cohensKappa(df: DataFrame, truthCol: Column, predCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val M = 1000000L
    val conf = df.select(truthCol.as("__t"), predCol.as("__p"))
      .groupBy(col("__t"), col("__p")).agg(count(lit(1)).as("__n"))
    conf
      .withColumn("__r", sum(col("__n")).over(Window.partitionBy(col("__t"))))
      .withColumn("__c", sum(col("__n")).over(Window.partitionBy(col("__p"))))
      .agg(
        sum(col("__n")).as("n_rows"),
        sum(when(col("__t") === col("__p"), col("__n")).otherwise(0L))
          .as("n_agree"),
        // Σ rᵢ·cᵢ counts each diagonal cell's product once: the (t,p)
        // cell carries r_t·c_p only when t == p.
        sum(when(col("__t") === col("__p"),
          col("__r").cast(dec) * col("__c").cast(dec))
          .otherwise(lit(0).cast(dec))).as("__src"))
      .select(
        col("n_rows"), col("n_agree"),
        expr(s"(n_agree * CAST($M AS BIGINT)) div n_rows").as("po_fp"),
        // integral `div` on decimals: exact floor (operands non-negative),
        // never a rounded fractional-scale decimal division
        expr(s"CAST((__src * $M) div " +
          "(CAST(n_rows AS DECIMAL(38,0)) * n_rows) AS BIGINT)").as("pe_fp"),
        (col("n_rows").cast(dec) * col("n_agree") - col("__src")).cast("double")
          ./(((col("n_rows").cast(dec) * col("n_rows")) - col("__src"))
            .cast("double")).as("kappa"))
  }

  /** Pearson chi-squared test of independence between two categorical
    * columns — "is language actually independent of source":
    *   χ² = Σ_cells (n_ij·N − r_i·c_j)² / (N·r_i·c_j)
    * (the (O−E)²/E form scaled by N to stay integral until the last
    * step). Numerator and denominator are exact DECIMAL(38,0) per cell;
    * each cell's term is quantized ONCE to 10⁻⁶ fixed point and the
    * statistic is an exact long sum — partition-order-independent.
    * dof = (|A|−1)·(|B|−1) from the same confusion table.
    *
    * One pass to the observed confusion table (persisted — it feeds both
    * marginals and the dense grid; per-call lifecycle), then the FULL
    * |A|·|B| grid is rebuilt from the marginal cross product so that
    * observed-zero cells contribute their expected mass r·c/N — omitting
    * them understates χ² exactly when dependence is strongest. Output is
    * ONE row: (n_rows, n_cells, dof, chi2_fp).
    */
  def chiSquared(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val conf = df.select(aCol.as("__a"), bCol.as("__b"))
      .groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ra = conf.groupBy(col("__a")).agg(sum(col("__n")).as("__r"))
    val cb = conf.groupBy(col("__b")).agg(sum(col("__n")).as("__c"))
    ra.join(cb)
      .join(conf, Seq("__a", "__b"), "left")
      .withColumn("__nn", coalesce(col("__n"), lit(0L)))
      .withColumn("__t", sum(col("__nn")).over(Window.partitionBy(lit(1))))
      .withColumn("__num",
        (col("__nn").cast(dec) * col("__t") - col("__r").cast(dec) * col("__c"))
          .cast("double"))
      // the square happens in doubles — num² would overflow DECIMAL(38,0)
      // past ~10¹⁹ rows·cells; double rounding is identical in both
      // engines for the identical operand, so the term stays bit-stable
      .withColumn("__term",
        floor(col("__num") * col("__num")
          / (col("__t").cast(dec) * col("__r") * col("__c")).cast("double")
          * lit(1000000.0)).cast("long"))
      .agg(sum(col("__nn")).as("n_rows"), count(lit(1)).as("n_cells"),
        ((countDistinct(col("__a")) - 1) * (countDistinct(col("__b")) - 1))
          .as("dof"),
        sum(col("__term")).as("chi2_fp"))
  }

  /** Wilson score interval per group — the confidence band around a
    * conversion/positive rate that stays inside [0,1] and behaves at
    * small n (what a dashboard should draw instead of ±1.96·√(pq/n)):
    *   centre = p + z²/2n,  rad = z·√(p(1−p)/n + z²/4n²),
    *   [lo, hi] = (centre ∓ rad) / (1 + z²/n).
    * A fixed IEEE tree over exact counts (z literal) — identical bits in
    * both engines. One map-side-combinable count pass.
    *
    * Output: (group, n, positives, rate_fp, wilson_lo, wilson_hi).
    */
  def wilsonBounds(df: DataFrame, groupCol: Column, labelCol: Column,
                   z: Double = 1.96): DataFrame = {
    require(z > 0, s"wilsonBounds: z > 0, got $z")
    val M = 1000000L
    df.select(groupCol.as("group"), labelCol.as("__l"))
      .groupBy(col("group"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__l"), 1L).otherwise(0L)).as("positives"))
      .withColumn("__p", col("positives").cast("double") / col("n"))
      .withColumn("__den", lit(1.0) + lit(z * z) / col("n"))
      .withColumn("__ctr", col("__p") + lit(z * z) / (lit(2.0) * col("n")))
      .withColumn("__rad",
        lit(z) * sqrt(col("__p") * (lit(1.0) - col("__p")) / col("n")
          + lit(z * z) / (lit(4.0) * col("n") * col("n"))))
      .select(col("group"), col("n"), col("positives"),
        expr(s"(positives * CAST($M AS BIGINT)) div n").as("rate_fp"),
        ((col("__ctr") - col("__rad")) / col("__den")).as("wilson_lo"),
        ((col("__ctr") + col("__rad")) / col("__den")).as("wilson_hi"))
  }

  /** Leave-one-out target encoding with a global prior — the
    * feature-engineering workhorse for high-cardinality categoricals,
    * built leakage-safe (each row's own label is subtracted from its
    * category's count, so the encoding never sees the row it describes):
    *   enc_fp = ((c_g − xᵢ)·10⁶ + m·rate_fp) div (n_g − 1 + m)
    * where rate_fp is the global positive rate in ppm and `priorM` is the
    * smoothing pseudo-count pulling rare categories toward it. The
    * formula IS the contract — every term exact integer, identical bits
    * under any partitioning or engine.
    *
    * Two passes by nature (category counts must exist before any row can
    * encode): one map-side-combinable count pass to the category-sized
    * stats table (broadcast back), one map pass to encode. The global
    * rate rides a 1-row broadcast the same way.
    *
    * Output: (id, category, label, enc_fp).
    */
  def targetEncodeLoo(df: DataFrame, catCol: Column, idCol: Column,
                      labelCol: Column, priorM: Int = 10): DataFrame = {
    require(priorM >= 1, s"targetEncodeLoo: priorM >= 1, got $priorM")
    val M = 1000000L
    val base = df.select(catCol.as("category"), idCol.as("id"),
      labelCol.as("label"))
    val cats = base.groupBy(col("category"))
      .agg(count(lit(1)).as("__ng"),
        sum(when(col("label"), 1L).otherwise(0L)).as("__cg"))
    val global = base.agg(count(lit(1)).as("__nt"),
      sum(when(col("label"), 1L).otherwise(0L)).as("__ct"))
      .select(expr(s"(__ct * CAST($M AS BIGINT)) div __nt").as("__rate"))
    base.join(broadcast(cats), Seq("category")).join(broadcast(global))
      .select(col("id"), col("category"), col("label"),
        expr(s"((__cg - (CASE WHEN label THEN 1 ELSE 0 END)) * " +
          s"CAST($M AS BIGINT) + $priorM * __rate) div " +
          s"(__ng - 1 + $priorM)").as("enc_fp"))
  }

  /** Two-proportion z-test between every variant pair — the experiment
    * readout ("did B convert better than A, and is it noise"): per pair,
    *   z = (p₂ − p₁) / √(p̂(1−p̂)(1/n₁ + 1/n₂)),  p̂ pooled,
    * plus the relative lift in exact ppm. The per-variant reduction is
    * ONE map-side-combinable count pass; pairing happens on the
    * |variants|-row aggregate. The z expression is a fixed IEEE tree over
    * exact integer counts (every division/sqrt correctly rounded, so both
    * engines emit identical bits); lift is an exact DECIMAL(38,0)
    * cross-product in ppm, no float ratio.
    *
    * Pairs where either side has zero exposures or zero pooled variance
    * are dropped (the test is undefined). lift_fp is NULL when the
    * baseline converted nobody.
    *
    * Output: (variant_a, variant_b, n_a, conv_a, n_b, conv_b, lift_fp, z)
    * with variant_a < variant_b.
    */
  def abTest(df: DataFrame, variantCol: Column, convCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    // variants-sized and referenced by BOTH pair sides — persisted so the
    // data is scanned once (per-call lifecycle: session clearCache()).
    val per = df.select(variantCol.as("__v"), convCol.as("__c"))
      .groupBy(col("__v"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__c"), 1L).otherwise(0L)).as("conv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = per.select(col("__v").as("variant_a"), col("n").as("n_a"),
      col("conv").as("conv_a"))
    val b = per.select(col("__v").as("variant_b"), col("n").as("n_b"),
      col("conv").as("conv_b"))
    a.join(b, col("variant_a") < col("variant_b"))
      .filter(col("n_a") > 0 && col("n_b") > 0)
      .withColumn("__p1", col("conv_a").cast("double") / col("n_a"))
      .withColumn("__p2", col("conv_b").cast("double") / col("n_b"))
      .withColumn("__pp",
        (col("conv_a") + col("conv_b")).cast("double")
          / (col("n_a") + col("n_b")))
      .withColumn("__se2",
        col("__pp") * (lit(1.0) - col("__pp"))
          * (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
      .filter(col("__se2") > 0.0)
      .select(col("variant_a"), col("variant_b"), col("n_a"), col("conv_a"),
        col("n_b"), col("conv_b"),
        when(col("conv_a") > 0,
          expr(s"CAST(((CAST(conv_b AS $dec) * n_a - CAST(conv_a AS $dec) * n_b)" +
            s" * 1000000) div (CAST(conv_a AS $dec) * n_b) AS BIGINT)"))
          .as("lift_fp"),
        ((col("__p2") - col("__p1")) / sqrt(col("__se2"))).as("z"))
  }

  /** Calibration by score decile: rank rows by (score, id) — the unique
    * tiebreak every rank in this library carries — cut into `bins` exact
    * integer-division quantile bins, and report each bin's size, positive
    * count, mean score and positive rate (both ppm fixed point). A
    * monotone pos_rate over bins is what "higher score = better" actually
    * claims; this is the reliability diagram as a table.
    *
    * The global rank is ONE sort-exchange of (score, id, label) triples —
    * rank-based calibration is inherently a global order; at 100 TB the
    * histogram-sketch quantile cut ([[Sketches.histQuantiles]]) is the
    * approximate alternative, this is the exact one.
    *
    * Output: (bin, n, n_pos, mean_score_fp, pos_rate_fp).
    */
  def calibrationBins(df: DataFrame, scoreCol: String, idCol: String,
                      labelCol: Column, bins: Int = 10): DataFrame = {
    require(bins >= 2, s"calibrationBins: bins >= 2, got $bins")
    val M = 1000000L
    val w = Window.orderBy(col("__s").asc, col("__id").asc)
    df.select(col(scoreCol).cast("long").as("__s"), col(idCol).as("__id"),
        labelCol.as("__l"))
      .withColumn("__rk", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(lit(1))))
      .withColumn("bin", expr(s"((__rk - 1) * $bins) div __n + 1"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__l"), 1L).otherwise(0L)).as("n_pos"),
        sum(col("__s")).as("__ssum"))
      .select(col("bin"), col("n"), col("n_pos"),
        // Scores can be negative: Spark's `div` truncates toward zero but
        // DuckDB's `//` floors, so build floor division from pmod (the
        // remainder is non-negative, making the subtraction an exact
        // multiple) — tie-free and engine-identical.
        expr("(__ssum - pmod(__ssum, n)) div n").as("mean_score_fp"),
        expr(s"(n_pos * CAST($M AS BIGINT)) div n").as("pos_rate_fp"))
  }

  /** Mutual information between two categorical columns —
    * [[chiSquared]]'s information-theoretic sibling (feature selection's
    * default relevance score): MI = Σ_cells (n_ij/N)·ln(n_ij·N/(r_i·c_j)).
    * Zero cells contribute zero, so only OBSERVED cells are touched (no
    * full-grid rebuild, unlike χ² where absent cells carry expected
    * mass). Fixed-point recipe: the log factor is quantized ONCE per
    * cell (`floor(ln(ratio)·10⁶)`, the q84 contract), multiplied by the
    * exact integer n_ij, summed as longs, divided by N once — exact,
    * commutative, order-independent; mi_fp ≈ MI·10⁶ in nats.
    *
    * One pass to the confusion table, marginals via table-sized windows,
    * row-local term arithmetic. Output is ONE row:
    * (n_rows, n_cells, mi_fp).
    */
  def mutualInformation(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val conf = df.select(aCol.as("__a"), bCol.as("__b"))
      .groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__n"))
    conf
      .withColumn("__r", sum(col("__n")).over(Window.partitionBy(col("__a"))))
      .withColumn("__c", sum(col("__n")).over(Window.partitionBy(col("__b"))))
      .withColumn("__t", sum(col("__n")).over(Window.partitionBy(lit(1))))
      .withColumn("__l",
        floor(log(col("__n").cast("double") * col("__t") /
          (col("__r").cast("double") * col("__c"))) * lit(1000000.0))
          .cast("long"))
      .agg(max(col("__t")).as("n_rows"), count(lit(1)).as("n_cells"),
        sum(col("__n") * col("__l")).as("__s"))
      .select(col("n_rows"), col("n_cells"),
        expr("(__s - pmod(__s, n_rows)) div n_rows").as("mi_fp"))
  }

  /** Welch's unequal-variance t-test between exactly two groups — the
    * numeric-drift / A-B means test ([[abTest]] covers proportions):
    * sufficient statistics (n, Σq, Σq²) accumulate exactly in
    * DECIMAL(38,0) from caller-quantized longs, then mean/variance/t and
    * the Welch–Satterthwaite df come out of a PINNED chain of IEEE
    * double ops (div/mul/sub/sqrt are all correctly rounded, the
    * groupZScores precedent) — bit-identical cross-engine from identical
    * integers. Groups are ordered (group_a < group_b) so the t sign is
    * deterministic.
    *
    * Output is ONE row: (group_a, group_b, n_a, n_b, mean_a, mean_b,
    * t_stat, df_welch). Requires exactly two observed groups and n ≥ 2
    * with nonzero variance on both sides.
    */
  def welchTTest(df: DataFrame, groupCol: Column, valueFpCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val stats = df.select(groupCol.cast("string").as("__g"),
        valueFpCol.cast("long").as("__q"))
      .filter(col("__g").isNotNull)
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("__n"), sum(col("__q").cast(dec)).as("__s1"),
        sum(col("__q").cast(dec) * col("__q")).as("__s2"))
    val two = stats.orderBy(col("__g").asc).limit(3).collect()
    require(two.length == 2,
      s"welchTTest needs exactly two groups, got ${two.length}")
    def side(r: org.apache.spark.sql.Row) = {
      val n = r.getLong(1).toDouble
      val s1 = r.getDecimal(2).doubleValue()
      val s2 = r.getDecimal(3).doubleValue()
      require(n >= 2, s"welchTTest: group ${r.getString(0)} has n < 2")
      val mean = s1 / n
      val v = (n * s2 - s1 * s1) / (n * (n - 1))
      (r.getString(0), n, mean, v)
    }
    val (ga, na, ma, va) = side(two(0))
    val (gb, nb, mb, vb) = side(two(1))
    require(va > 0 && vb > 0, "welchTTest: zero variance on one side")
    val se2a = va / na
    val se2b = vb / nb
    val t = (ma - mb) / math.sqrt(se2a + se2b)
    val dfW = (se2a + se2b) * (se2a + se2b) /
      (se2a * se2a / (na - 1) + se2b * se2b / (nb - 1))
    val spark = df.sparkSession
    import spark.implicits._
    Seq((ga, gb, na.toLong, nb.toLong, ma, mb, t, dfW))
      .toDF("group_a", "group_b", "n_a", "n_b", "mean_a", "mean_b",
        "t_stat", "df_welch")
  }

  /** Two-sample Kolmogorov–Smirnov statistic — the distribution-SHAPE
    * drift test ([[welchTTest]] sees means; KS sees everything): D =
    * max over values of |F_a(v) − F_b(v)|. Exact integers by
    * cross-multiplication: at each observed value,
    * |cum_a·n_b − cum_b·n_a| is an exact DECIMAL(38,0), and
    * d_ppm = max·10⁶ div (n_a·n_b). One map-side-combinable agg to
    * value grain, one value-grain running window, one scalar rollup.
    *
    * Output is ONE row: (n_a, n_b, d_ppm, at_value — the first value
    * attaining the max, value-ascending tiebreak).
    */
  def ksTest(df: DataFrame, groupCol: Column, valueFpCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val base = df.select(groupCol.cast("string").as("__g"),
        valueFpCol.cast("long").as("__v"))
      .filter(col("__g").isNotNull && col("__v").isNotNull)
    val groups = base.select(col("__g")).distinct()
      .orderBy(col("__g").asc).limit(3).collect().map(_.getString(0))
    require(groups.length == 2,
      s"ksTest needs exactly two groups, got ${groups.length}")
    val (ga, gb) = (groups(0), groups(1))
    val w = Window.orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(lit(1))
    base.groupBy(col("__v")).agg(
        sum(when(col("__g") === ga, 1L).otherwise(0L)).as("__ca"),
        sum(when(col("__g") === gb, 1L).otherwise(0L)).as("__cb"))
      .withColumn("__cuma", sum(col("__ca")).over(w))
      .withColumn("__cumb", sum(col("__cb")).over(w))
      .withColumn("__na", sum(col("__ca")).over(wAll))
      .withColumn("__nb", sum(col("__cb")).over(wAll))
      .withColumn("__diff",
        abs(col("__cuma").cast(dec) * col("__nb") -
          col("__cumb").cast(dec) * col("__na")))
      .orderBy(col("__diff").desc, col("__v").asc).limit(1)
      .select(lit(ga).as("group_a"), lit(gb).as("group_b"),
        col("__na").as("n_a"), col("__nb").as("n_b"),
        expr(s"CAST((__diff * 1000000) div " +
          s"(CAST(__na AS $dec) * __nb) AS BIGINT)").as("d_ppm"),
        col("__v").as("at_value"))
  }

  /** Exact AUC (area under the ROC curve) from the Mann–Whitney
    * rank-sum — the headline ranking metric [[thresholdSweep]]'s pointwise
    * curve summarizes: the probability a random positive outscores a
    * random negative, ties counting half. Exact integers throughout via
    * DOUBLED midranks (a tie group spanning positions [a, b] has midrank
    * (a+b)/2 — doubled it is the integer a+b = 2·cum_before + cnt + 1):
    *   U·2 = Σ_pos midrank2 − n_pos·(n_pos+1)
    *   auc_ppm = U·2·10⁶ div (2·n_pos·n_neg)
    * so the number is bit-identical cross-engine with no float in sight.
    *
    * Scale posture: one map-side-combinable agg to SCORE-VALUE grain
    * (cnt, pos_cnt per distinct score), one running window over that
    * value-grain table (score cardinality, not row count — fixed-point
    * model scores keep this small), one scalar rollup. NULL labels are
    * excluded up front (the thresholdSweep contract).
    *
    * Output is ONE row: (n_pos, n_neg, auc_ppm, gini_ppm = 2·auc − 10⁶).
    */
  def aucExact(df: DataFrame, scoreCol: String, labelCol: Column): DataFrame = {
    val M = 1000000L
    val byScore = df.select(col(scoreCol).cast("long").as("__s"),
        labelCol.as("__l"))
      .filter(col("__l").isNotNull)
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("__cnt"),
        sum(when(col("__l"), 1L).otherwise(0L)).as("__pos"))
    val w = Window.orderBy(col("__s").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    byScore
      .withColumn("__before", coalesce(sum(col("__cnt")).over(w), lit(0L)))
      .withColumn("__mid2", lit(2L) * col("__before") + col("__cnt") + 1)
      .agg(sum(col("__pos")).as("n_pos"),
        sum(col("__cnt") - col("__pos")).as("n_neg"),
        sum(col("__pos").cast("decimal(38,0)") * col("__mid2"))
          .as("__rank2sum"))
      .select(col("n_pos"), col("n_neg"),
        // one-class inputs have no ROC: NULL, not an ANSI divide error
        when(col("n_pos") > 0 && col("n_neg") > 0,
          expr(s"""CAST((__rank2sum - CAST(n_pos AS DECIMAL(38,0)) *
              (n_pos + 1)) * $M div
            (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT)"""))
          .as("auc_ppm"))
      .withColumn("gini_ppm", lit(2L) * col("auc_ppm") - lit(M))
  }

  /** [[sprtTest]]'s four 2²⁰-fixed-point constants (per-observation
    * increments and Wald bounds), public so generated oracles embed the
    * identical literals.
    */
  def sprtConstants(p0: Double, p1: Double, alpha: Double,
                    beta: Double): (Long, Long, Long, Long) = {
    val S = (1L << 20).toDouble
    (math.round(math.log(p1 / p0) * S),
      math.round(math.log((1 - p1) / (1 - p0)) * S),
      math.round(math.log((1 - beta) / alpha) * S),
      math.round(math.log(beta / (1 - alpha)) * S))
  }

  /** Wald's sequential probability ratio test (SPRT, 1945) — the
    * early-stopping A/B monitor: observing a Bernoulli stream, decide
    * between rate p0 and rate p1 the moment the evidence clears the
    * (α, β) error bounds instead of waiting for a fixed n. Each
    * observation adds a CONSTANT log-likelihood increment (positive:
    * ln(p1/p0); negative: ln((1−p1)/(1−p0))), so the whole trajectory is
    * an integer cumulative sum of two build-time 2²⁰-fixed-point
    * literals, compared against the literal Wald bounds
    * ln((1−β)/α) / ln(β/(1−α)) — no float at query time, bit-identical
    * cross-engine.
    *
    * Output: per observation (ordered by `ordCol`, unique within its
    * stream), (keys…, ord, n_seen, n_pos, llr_fp, decision) with
    * decision ∈ {accept_h1, accept_h0, continue} — the full audit
    * trajectory; the first non-continue row is the stopping point.
    *
    * Scale: a trajectory is inherently sequential, so each stream is
    * ONE sorted run — pass `keys` (experiment/variant ids) to shard
    * across streams; an unkeyed call funnels everything through a
    * single partition, fine only for monitor-sized streams.
    */
  def sprtTest(df: DataFrame, ordCol: String, labelCol: Column,
               p0: Double, p1: Double, alpha: Double = 0.05,
               beta: Double = 0.2, keys: Seq[String] = Nil): DataFrame = {
    require(0 < p0 && p0 < p1 && p1 < 1,
      s"sprtTest: need 0 < p0 < p1 < 1, got p0=$p0 p1=$p1")
    require(0 < alpha && alpha < 0.5 && 0 < beta && beta < 0.5,
      s"sprtTest: alpha/beta in (0, 0.5), got $alpha/$beta")
    val (upFp, downFp, aFp, bFp) = sprtConstants(p0, p1, alpha, beta)
    val base = if (keys.isEmpty) Window.partitionBy(lit(1))
      else Window.partitionBy(keys.map(col): _*)
    val w = base.orderBy(col(ordCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(keys.map(col) :+ col(ordCol) :+ labelCol.as("__l"): _*)
      .filter(col("__l").isNotNull)
      .withColumn("n_seen", count(lit(1)).over(w))
      .withColumn("n_pos",
        sum(when(col("__l"), 1L).otherwise(0L)).over(w))
      .select(keys.map(col) :+ col(ordCol) :+ col("n_seen") :+ col("n_pos") :+
        (col("n_pos") * upFp + (col("n_seen") - col("n_pos")) * downFp)
          .as("llr_fp"): _*)
      .withColumn("decision",
        when(col("llr_fp") >= aFp, "accept_h1")
          .when(col("llr_fp") <= bFp, "accept_h0")
          .otherwise("continue"))
  }

  /** The 1/log₂(pos+1) discount table for [[rankingMetrics]]: entry pos
    * (1-based) = round(2³⁰ / log₂(pos+1)). Precomputed once at
    * plan-build time and embedded as literals on BOTH engines (the
    * [[graft.ml.Sketches.linearCountLut]] pattern), so nDCG needs no
    * query-time libm and stays hash-gateable.
    */
  def ndcgDiscountLut(k: Int): Seq[Long] =
    (1 to k).map(pos =>
      math.round((1L << 30).toDouble / (math.log(pos + 1.0) / math.log(2.0))))

  /** Retrieval-evaluation metrics at cutoff k — the IR QA suite behind
    * every embedding/BM25/RRF ranking in the library: per query, hit
    * counts, MRR, DCG/IDCG and nDCG, recall and precision. The numbers a
    * team watches when swapping ANN indexes or fusion weights.
    *
    * Inputs: `ranked` (queryCol, docCol, `rank` 1-based — the system
    * output, e.g. a top-k join's rank column) and `rels` (queryCol,
    * docCol, `rel` integer grade ≥ 0; pairs absent = grade 0). Graded
    * gain is 2^rel − 1; positions discount through [[ndcgDiscountLut]],
    * so every metric is exact integer arithmetic: mrr_fp = 2³⁰ div
    * first-relevant-rank, dcg_fp = Σ gain·lut[pos], idcg_fp the same sum
    * over the query's grades sorted descending (docCol-tiebroken), and
    * the ratios parts-per-million div's. Queries with no relevant docs
    * report NULL ndcg/recall (0/0), mrr_fp 0.
    *
    * Scale posture: one broadcast-or-shuffle equi-join of the rank-≤-k
    * slice against the relevance table, one map-side-combinable agg per
    * side, one query-grain join to marry them; the ideal ranking's
    * window sorts RELEVANT rows only (rel > 0), never the corpus.
    *
    * Output: (query, n_rel, hits, mrr_fp, dcg_fp, idcg_fp, ndcg_ppm,
    * recall_ppm, precision_ppm).
    */
  def rankingMetrics(ranked: DataFrame, rels: DataFrame, queryCol: String,
                     docCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 100, s"rankingMetrics: k in [1, 100], got $k")
    val M = 1000000L
    val lut = ndcgDiscountLut(k)
    val lutCol = array(lut.map(lit): _*)
    val posRels = rels.filter(col("rel") > 0)
      .select(col(queryCol), col(docCol), col("rel").cast("long").as("rel"))
    val topk = ranked.filter(col("rank") <= k)
      .select(col(queryCol), col(docCol), col("rank").cast("int").as("rank"))
      .join(posRels, Seq(queryCol, docCol), "left")
      .na.fill(0L, Seq("rel"))
    val got = topk.groupBy(col(queryCol)).agg(
      sum(when(col("rel") > 0, 1L).otherwise(0L)).as("hits"),
      coalesce(min(when(col("rel") > 0, col("rank"))), lit(0))
        .as("__first_rel"),
      sum((expr("shiftleft(CAST(1 AS BIGINT), CAST(rel AS INT))") - 1) *
        element_at(lutCol, col("rank"))).as("dcg_fp"),
      count(lit(1)).as("__n_ranked"))
    // Ideal ranking: the query's own grades, best first, cut at k.
    val w = Window.partitionBy(col(queryCol))
      .orderBy(col("rel").desc, col(docCol).asc)
    val ideal = posRels.withColumn("__pos", row_number().over(w))
      .filter(col("__pos") <= k)
      .groupBy(col(queryCol)).agg(
        sum((expr("shiftleft(CAST(1 AS BIGINT), CAST(rel AS INT))") - 1) *
          element_at(lutCol, col("__pos"))).as("idcg_fp"),
        count(lit(1)).as("__n_topk"))
    val nRel = posRels.groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_rel"))
    got.join(nRel.join(ideal, Seq(queryCol)), Seq(queryCol), "left")
      .select(col(queryCol), coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        col("hits"),
        when(col("__first_rel") > 0,
          expr(s"CAST(${1L << 30} AS BIGINT) div __first_rel"))
          .otherwise(lit(0L)).as("mrr_fp"),
        col("dcg_fp"), coalesce(col("idcg_fp"), lit(0L)).as("idcg_fp"),
        when(coalesce(col("idcg_fp"), lit(0L)) > 0,
          expr(s"(dcg_fp * CAST($M AS BIGINT)) div idcg_fp")).as("ndcg_ppm"),
        when(coalesce(col("n_rel"), lit(0L)) > 0,
          expr(s"(hits * CAST($M AS BIGINT)) div n_rel")).as("recall_ppm"),
        expr(s"(hits * CAST($M AS BIGINT)) div __n_ranked")
          .as("precision_ppm"))
  }
}
