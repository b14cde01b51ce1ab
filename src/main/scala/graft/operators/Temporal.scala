package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Time-ordered operators Spark lacks as built-ins: backward as-of join and
  * gap-based sessionization. Both are expressed as ONE shuffle on the join /
  * session keys plus a per-partition sort — never an inequality join, which
  * Spark can only plan as a broadcast nested loop (quadratic per key, and a
  * non-starter against a 100 TB fact side).
  */
object Temporal {

  /** As-of join, all three merge_asof directions. For every left row,
    * attach (nulls when no candidate exists):
    *  - `backward` (default): the right row with the greatest
    *    `(rightTs, rightTie…)` among same-key rows with `rightTs <= leftTs`;
    *  - `forward`: the right row with the SMALLEST `(rightTs, rightTie…)`
    *    among same-key rows with `rightTs >= leftTs`;
    *  - `nearest`: whichever of those two candidates is closer in ts;
    *    exact-distance ties (including rightTs == leftTs) take the
    *    backward row. Requires a ts type whose `-` yields an ordered
    *    value (numeric or timestamp).
    *
    * Implementation is the union-then-window idiom: tag both sides, union on
    * a common schema, sort each key partition once by `(ts, side, tie…)`
    * with right rows BEFORE left rows at equal ts (<= semantics), and carry
    * the payload forward with `last(…, ignoreNulls)` over the preceding
    * frame. The right payload travels as ONE struct so all its columns come
    * from the SAME right row atomically.
    *
    * Scale posture: one exchange on `keys` + one sort — the same cost as a
    * plain shuffle join; right-side duplicates and skew behave like any
    * window over the key. Unlike the join-based formulation there is no
    * per-key candidate blowup: each right row is examined once in sort
    * order regardless of how many left rows it serves.
    *
    * Caveat: window partitioning groups NULL keys together (SQL joins drop
    * them) — pre-filter null keys if join semantics are wanted. Right rows
    * with a NULL timestamp are dropped here (they sort first under the
    * ascending window order and would otherwise become match candidates,
    * where the SQL inequality formulation excludes them). Left rows with a
    * NULL timestamp get NULL matches in every direction (both scan orders
    * put nulls first, so their preceding frame holds no right row) — the
    * same result as SQL's always-false NULL comparisons.
    *
    * Determinism: `rightTie` must totally order right rows within
    * `(keys, rightTs)`; left-row order within a tie never matters (left
    * rows carry no payload and only read the preceding frame).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, rightTie: Seq[String],
               rightPayload: Seq[String],
               direction: String = "backward",
               tolerance: Option[Long] = None): DataFrame = {
    require(tolerance.forall(_ >= 0),
      s"asofJoin: tolerance must be >= 0, got $tolerance")
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    require(rightPayload.nonEmpty, "asofJoin with no payload columns")
    require(Set("backward", "forward", "nearest")(direction),
      s"asofJoin: direction must be backward|forward|nearest, got $direction")
    val clash = rightPayload.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"asofJoin payload collides with left columns: $clash")
    require(left.schema(leftTs).dataType == right.schema(rightTs).dataType,
      s"asofJoin ts types differ: ${left.schema(leftTs).dataType} vs " +
        s"${right.schema(rightTs).dataType}")

    // The matched row's ts rides in the struct (field __mts) so `nearest`
    // can compare distances without a second payload path.
    val payloadType = StructType(
      StructField("__mts", right.schema(rightTs).dataType) +:
        rightPayload.map(right.schema(_)))
    val tieNames = rightTie.map(n => s"__tie_$n")
    val leftOnly = left.columns.toSeq.filterNot(keys.contains)

    val rightSide = right.filter(col(rightTs).isNotNull).select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side"),
            struct(col(rightTs).as("__mts") +: rightPayload.map(col): _*)
              .as("__r")) ++
        rightTie.zip(tieNames).map { case (n, a) => col(n).as(a) } ++
        leftOnly.map(n => lit(null).cast(left.schema(n).dataType).as(n)): _*)
    val leftSide = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side"),
            lit(null).cast(payloadType).as("__r")) ++
        rightTie.zip(tieNames).map { case (n, a) =>
          lit(null).cast(right.schema(n).dataType).as(a) } ++
        leftOnly.map(col): _*)

    // backward: ascending scan, running last right row ≤ current ts.
    // forward: the mirror — DESCENDING ts (ties DESCENDING too), so the
    // running last non-null is the MINIMAL (ts, tie…) right row ≥ current.
    // __side stays ascending in both: right rows sort before left rows at
    // equal ts, which is what makes both bounds inclusive.
    def running(ord: Seq[Column]) =
      last(col("__r"), ignoreNulls = true).over(
        Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val backOrd = col("__ts").asc +: col("__side").asc +:
      tieNames.map(col(_).asc)
    // __ts must be desc_nulls_FIRST: Spark's plain desc is NULLS LAST, which
    // would sort a null-ts LEFT row after every right row, handing it the
    // minimal right row as a spurious match — SQL's >=/<= comparisons are
    // false on NULL, so a null-ts left row must match nothing. With nulls
    // first it sees only other null-__r rows in its frame ⇒ null match.
    // (Right-side null-ts rows are filtered above; tie columns keep plain
    // desc = nulls last, the exact mirror of backOrd's asc = nulls first.)
    val fwdOrd = col("__ts").desc_nulls_first +: col("__side").asc +:
      tieNames.map(col(_).desc)

    val unioned = rightSide.unionByName(leftSide)
    val matched = direction match {
      case "backward" => unioned.withColumn("__m", running(backOrd))
      case "forward"  => unioned.withColumn("__m", running(fwdOrd))
      case "nearest" =>
        // Both directions from ONE exchange (same partition keys — Spark
        // plans a second in-partition sort, not a second shuffle; spec-
        // asserted), then the closer match wins; exact-distance ties
        // prefer the backward row.
        unioned
          .withColumn("__mb", running(backOrd))
          .withColumn("__mf", running(fwdOrd))
          .withColumn("__m",
            when(col("__mf").isNull, col("__mb"))
              .when(col("__mb").isNull, col("__mf"))
              .when(col("__ts") - col("__mb.__mts") <=
                col("__mf.__mts") - col("__ts"), col("__mb"))
              .otherwise(col("__mf")))
    }
    // Tolerance (pandas merge_asof semantics): a match farther than
    // `tolerance` time units is no match at all. Row-local null-out of
    // the carried struct — |Δ| covers all three directions, and a null
    // match stays null (null comparison → null → otherwise-null).
    val bounded = tolerance.fold(matched) { tol =>
      matched.withColumn("__m",
        when(abs(col("__ts") - col("__m.__mts")) <= tol, col("__m")))
    }
    bounded
      .filter(col("__side") === 1)
      .select(left.columns.map(col).toSeq ++
        rightPayload.map(n => col("__m").getField(n).as(n)): _*)
  }

  /** Gap-based sessionization: within each key, rows ordered by
    * `(tsCol, tieCols…)` belong to the same session until a gap larger than
    * `gap` (same units as `tsCol`) opens; `session_seq` numbers sessions
    * per key from 1. One shuffle on the keys; the lag and the running sum
    * share the partitioning and sort, so Spark plans them as consecutive
    * Window ops over a single exchange.
    *
    * This is the batch mirror of Structured Streaming's session windows
    * (which need state + watermarks); for historical backfill the sort-based
    * form is the scalable one.
    */
  def sessionize(df: DataFrame, keys: Seq[String], tsCol: String,
                 tieCols: Seq[String], gap: Long): DataFrame = {
    require(keys.nonEmpty, "sessionize needs at least one key column")
    require(gap > 0, "sessionize gap must be positive")
    val order = col(tsCol).asc +: tieCols.map(col(_).asc)
    val wOrd = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col(tsCol), 1).over(wOrd)
    val isNew = when(prev.isNull || col(tsCol) - prev > gap, 1).otherwise(0)
    df.withColumn("__new", isNew)
      .withColumn("session_seq", sum(col("__new")).over(wRun))
      .drop("__new")
  }

  /** Session-grain rollup over [[sessionize]]'s output: one row per
    * (keys…, session_seq) with `session_start`/`session_end` (min/max of
    * `tsCol`, same units), `session_duration` (their difference), and
    * `n_events`. The groupBy keys extend the window's partition keys, so
    * hash-partitioning on `keys` already co-locates every session's rows —
    * Spark plans the rollup WITHOUT a second exchange: the whole operator
    * stays the sessionization's single shuffle (TemporalSpec asserts it).
    */
  def sessionizeAgg(df: DataFrame, keys: Seq[String], tsCol: String,
                    tieCols: Seq[String], gap: Long): DataFrame =
    sessionize(df, keys, tsCol, tieCols, gap)
      .groupBy(keys.map(col) :+ col("session_seq"): _*)
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        (max(col(tsCol)) - min(col(tsCol))).as("session_duration"),
        count(lit(1)).as("n_events"))

  /** Fixed-grain resample with forward fill — the time-series
    * regularization pass (the reference's per-minute fact rollup
    * `/root/reference/analytics/models/marts/fct_sales_by_minute.sql`
    * aggregates only OBSERVED minutes; training pipelines and gap-aware
    * reporting need the dense grid with the last observation carried
    * forward).
    *
    * Per key: buckets from the key's first to its last observation at
    * `grainUs`, each carrying the LAST observed value at-or-before the
    * bucket's end — `(bucket, value, observed)` where `observed` marks
    * buckets with at least one real observation. Last-in-bucket is
    * decided by `(tsCol, tieCols…)` so equal-timestamp observations
    * resolve identically on any engine.
    *
    * Scale posture: two exchanges, no join, no materialized spine — one
    * hash on (keys, bucket) for the in-bucket reduce (map-side
    * combinable max-of-struct), one on keys for a single `lead` window;
    * gap buckets are then GENERATED map-side by exploding each observed
    * bucket forward to its successor, so the carried value is the fill
    * (no spine join, no ignore-nulls pass) and a gap row never rides a
    * shuffle as input. Per-key output is bounded by the key's observed
    * span over the grain, not the corpus.
    *
    * Bucketing uses integer `div` (ts non-negative by the epoch-µs
    * contract): a double division would lose unit precision at 2024
    * epoch-µs magnitudes (ulp ≈ 0.25 at 1.7e15) and misplace boundary
    * observations.
    */
  def resampleFfill(df: DataFrame, keys: Seq[String], tsCol: String,
                    tieCols: Seq[String], valueCol: String,
                    grainUs: Long): DataFrame = {
    require(keys.nonEmpty, "resampleFfill needs at least one key column")
    require(grainUs > 0, s"resampleFfill grain must be positive, got $grainUs")
    // Last observation per (key, bucket): lexicographic max of the
    // (ts, ties…, value) struct — map-side combinable, no window needed.
    val ord = struct((col(tsCol) +: tieCols.map(col)) :+
      col(valueCol).as("__v"): _*)
    val perBucket = df
      .withColumn("__b", expr(s"`$tsCol` div ${grainUs}L"))
      .groupBy(keys.map(col) :+ col("__b"): _*)
      .agg(max(ord).as("__last"))
      .select(keys.map(col) :+ col("__b") :+
        col("__last.__v").as("__obs"): _*)
    val wOrd = Window.partitionBy(keys.map(col): _*).orderBy(col("__b").asc)
    perBucket
      .withColumn("__next", lead(col("__b"), 1).over(wOrd))
      .select(keys.map(col) :+ col("__b") :+ col("__obs") :+
        explode(sequence(col("__b"),
          coalesce(col("__next") - 1, col("__b")))).as("bucket"): _*)
      .select(keys.map(col) :+ col("bucket") :+
        col("__obs").as("value") :+
        (col("bucket") === col("__b")).as("observed"): _*)
  }

  /** Windowed first/last-touch attribution — for every conversion event,
    * the earliest and latest touch-type event of the same key inside the
    * trailing attribution window `[conv_ts − windowUs, conv_ts]`
    * (marketing attribution; the reference's order state machine tracks
    * the conversion side only).
    *
    * Single-shuffle formulation (the as-of/sessionize family's move): one
    * unioned event stream per key, touches staged as a nullable
    * `(ts, tie…, type)` struct, and `min`/`max` of that struct over a
    * RANGE frame of `windowUs` preceding — value-based, so equal-ts peers
    * are in-frame regardless of row order, and null stages (non-touch
    * rows) are ignored by min/max. Conversions with no in-window touch
    * keep nulls. No self-join, no per-conversion probe: one exchange on
    * the key, one sort, both extremes from the same frame.
    */
  def touchAttribution(events: DataFrame, keyCol: String, tsCol: String,
                       tieCol: String, typeCol: String,
                       touchTypes: Seq[String], convType: String,
                       windowUs: Long): DataFrame = {
    require(touchTypes.nonEmpty, "touchAttribution needs touch types")
    require(windowUs > 0, s"attribution window must be positive, got $windowUs")
    val touch = when(col(typeCol).isin(touchTypes: _*),
      struct(col(tsCol).as("ts"), col(tieCol).as("id"),
        col(typeCol).as("tp")))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).asc)
      .rangeBetween(-windowUs, 0)
    events
      .filter(col(keyCol).isNotNull)
      .withColumn("__touch", touch)
      .withColumn("__first", min(col("__touch")).over(w))
      .withColumn("__last", max(col("__touch")).over(w))
      .filter(col(typeCol) === convType)
      .select(col(keyCol), col(tieCol).as("conversion_id"),
        col(tsCol).as("conversion_ts_us"),
        col("__first.id").as("first_touch_id"),
        col("__first.tp").as("first_touch_type"),
        (col(tsCol) - col("__first.ts")).as("first_gap_us"),
        col("__last.id").as("last_touch_id"),
        col("__last.tp").as("last_touch_type"),
        (col(tsCol) - col("__last.ts")).as("last_gap_us"))
  }

  /** Trailing EWMA over a regularly-indexed series (daily metric smoothing)
    * with DYADIC weights, so the smoothed value is an exact long:
    * for each index t on the per-key spine [min..max],
    *   ewma_fp(t) = Σ_{j=0..H−1}  y_fp(t−j) · 2^(H−1−j)
    * i.e. the α=½ exponential window truncated at `horizon` lags, scaled by
    * 2^H (the caller divides, or compares fp values directly — trend/alert
    * thresholds scale the same way). Missing indices contribute zero, the
    * standard treatment for absent buckets in a metric store. Powers of two
    * make every term exact in long arithmetic: no float accumulation order
    * to pin, any partitioning gives the same bits.
    *
    * Shape (scale posture): each input row EXPLODES into its `horizon`
    * forward contributions map-side — a bounded ×H fanout, NOT a range
    * join (Spark plans inequality joins as broadcast nested loops) — then
    * ONE map-side-combinable sum per (key, index) and a join onto the
    * per-key spine. Spine rows are one per index per key; contributions
    * landing past a key's max index are dropped by the join.
    *
    * Requires `horizon` ≤ 32 and |y_fp| < 2^(62−horizon) for overflow-free
    * longs (ANSI mode makes violations loud, not silent).
    *
    * Output: keys + (idxCol, ewma_fp).
    */
  def ewmaTrailing(df: DataFrame, keys: Seq[String], idxCol: String,
                   yFpCol: String, horizon: Int = 16): DataFrame = {
    require(keys.nonEmpty, "ewmaTrailing needs series keys")
    require(horizon >= 1 && horizon <= 32,
      s"horizon must be in [1,32], got $horizon")
    val kc = keys.map(col)
    val contrib = df
      .select(kc :+ col(idxCol).cast("long").as("__i")
        :+ col(yFpCol).cast("long").as("__y"): _*)
      .withColumn("__j", explode(sequence(lit(0), lit(horizon - 1))))
      .select(kc :+ (col("__i") + col("__j")).as(idxCol)
        :+ expr(s"__y * shiftleft(CAST(1 AS BIGINT), ${horizon - 1} - __j)")
          .as("__w"): _*)
      .groupBy(kc :+ col(idxCol): _*)
      .agg(sum(col("__w")).as("__s"))
    val spine = df
      .groupBy(kc: _*)
      .agg(min(col(idxCol).cast("long")).as("__mn"),
        max(col(idxCol).cast("long")).as("__mx"))
      .select(kc :+ explode(sequence(col("__mn"), col("__mx"))).as(idxCol): _*)
    spine.join(contrib, keys :+ idxCol, "left")
      .select(kc :+ col(idxCol)
        :+ coalesce(col("__s"), lit(0L)).as("ewma_fp"): _*)
  }

  /** Seasonal-naive forecast error (MASE, Hyndman & Koehler 2006) — the
    * scale-free answer to "is my forecast better than just repeating
    * last week": per series, the mean absolute error of the
    * season-lagged naive forecast (ŷ_t = y_{t−season}) scaled by the
    * one-step naive MAE. MASE < 1e6 ppm means the seasonal pattern
    * beats a random walk; any real model must beat BOTH. Exact
    * integers: absolute errors are longs, the ratio one cross-multiplied
    * div:
    *   mase_ppm = (Σ|e_seasonal|·n_naive·10⁶) div (Σ|e_naive|·n_seasonal)
    *
    * One exchange per series for the two lag windows, one combinable
    * rollup. Series shorter than season+1 points, or with a constant
    * tail (zero naive denominator), report NULL mase_ppm. CONTRACT:
    * `idxCol` must be DENSE per series (row lag = calendar lag) —
    * resample gaps first ([[resampleFfill]] / [[interpolateLinear]]).
    *
    * Output per series: (keys…, n_points, n_seasonal_errors,
    * sum_abs_seasonal_fp, sum_abs_naive_fp, mase_ppm).
    */
  def seasonalNaiveError(df: DataFrame, keys: Seq[String], idxCol: String,
                         yFpCol: String, season: Int): DataFrame = {
    require(keys.nonEmpty, "seasonalNaiveError needs series keys")
    require(season >= 1 && season <= 10000,
      s"seasonalNaiveError: season in [1, 10000], got $season")
    val kc = keys.map(col)
    val w = Window.partitionBy(kc: _*).orderBy(col("__i").asc)
    df.select(kc :+ col(idxCol).cast("long").as("__i")
        :+ col(yFpCol).cast("long").as("__y"): _*)
      .withColumn("__ls", lag(col("__y"), season).over(w))
      .withColumn("__l1", lag(col("__y"), 1).over(w))
      .groupBy(kc: _*)
      .agg(count(lit(1)).as("n_points"),
        sum(when(col("__ls").isNotNull, 1L).otherwise(0L))
          .as("n_seasonal_errors"),
        sum(when(col("__ls").isNotNull, abs(col("__y") - col("__ls")))
          .otherwise(0L)).as("sum_abs_seasonal_fp"),
        sum(when(col("__l1").isNotNull, 1L).otherwise(0L)).as("__n1"),
        sum(when(col("__l1").isNotNull, abs(col("__y") - col("__l1")))
          .otherwise(0L)).as("sum_abs_naive_fp"))
      .select(kc :+ col("n_points") :+ col("n_seasonal_errors")
        :+ col("sum_abs_seasonal_fp") :+ col("sum_abs_naive_fp")
        :+ when(col("n_seasonal_errors") > 0 && col("sum_abs_naive_fp") > 0,
          expr("""CAST((CAST(sum_abs_seasonal_fp AS DECIMAL(38,0)) * __n1 *
              1000000) div
            (CAST(sum_abs_naive_fp AS DECIMAL(38,0)) * n_seasonal_errors)
            AS BIGINT)"""))
          .as("mase_ppm"): _*)
  }

  /** CUSUM change-point detection (Page 1954) — the SPC monitor that
    * catches small persistent shifts a [[rollingZOutliers]] spike test
    * misses: the one-sided statistic S_t = max(0, S_{t−1} + (x_t − μ₀ −
    * slack)) alarms when it exceeds the threshold. The recursion LOOKS
    * sequential but has the classic closed form S_t = C_t − min_{j≤t}
    * C_j over prefix sums C of (x − μ₀ − slack), so it computes as TWO
    * stacked windows (cumsum + running min) — exact integer arithmetic
    * on fixed-point values, no driver loop, both directions mirrored.
    *
    * Output per point: (keys…, idx, y_fp, cusum_up_fp, cusum_down_fp,
    * alarm_up, alarm_down). `idxCol` unique per series (the standing
    * tiebreaker contract).
    */
  def cusumChangePoints(df: DataFrame, keys: Seq[String], idxCol: String,
                        yFpCol: String, targetFp: Long, slackFp: Long,
                        thresholdFp: Long): DataFrame = {
    require(keys.nonEmpty, "cusumChangePoints needs series keys")
    require(slackFp >= 0 && thresholdFp > 0,
      s"cusumChangePoints: slack >= 0 and threshold > 0, got " +
        s"$slackFp/$thresholdFp")
    val kc = keys.map(col)
    val wCum = Window.partitionBy(kc: _*).orderBy(col("__i").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(kc :+ col(idxCol).cast("long").as("__i")
        :+ col(yFpCol).cast("long").as("__y"): _*)
      .withColumn("__cu", sum(col("__y") - lit(targetFp) - lit(slackFp))
        .over(wCum))
      .withColumn("__cd", sum(col("__y") - lit(targetFp) + lit(slackFp))
        .over(wCum))
      // min/max over [start, t] INCLUDING the virtual C_0 = 0 prefix
      .withColumn("__mu", least(lit(0L), min(col("__cu")).over(wCum)))
      .withColumn("__md", greatest(lit(0L), max(col("__cd")).over(wCum)))
      .select(kc :+ col("__i").as(idxCol) :+ col("__y").as("y_fp")
        :+ (col("__cu") - col("__mu")).as("cusum_up_fp")
        :+ (col("__md") - col("__cd")).as("cusum_down_fp"): _*)
      .withColumn("alarm_up", col("cusum_up_fp") > thresholdFp)
      .withColumn("alarm_down", col("cusum_down_fp") > thresholdFp)
  }

  /** Kaplan–Meier survival curve (1958) — retention/churn analysis with
    * CENSORING done right: users still active at the observation cutoff
    * are censored (they leave the risk set without counting as churn),
    * which naive retention curves get wrong. At each distinct duration
    * t: n_at_risk = subjects with duration ≥ t, d = events at t, and
    * S(t) = Π (1 − d/n) over event times ≤ t.
    *
    * Fixed-point recipe: each factor's log is quantized once
    * (`floor(ln((n−d)/n)·10⁶)`, the q84 contract) and the product
    * becomes an exact integer cumulative sum `log_s_fp`;
    * `survival_ppm = floor(exp(log_s_fp/10⁶)·10⁶)` re-exponentiates
    * through the same floor-quantize discipline. A time where everyone
    * remaining dies (d = n) sends survival to exactly 0 from there on
    * (log undefined — the `__dead` flag, not a NaN).
    *
    * One duration-grain agg + duration-grain windows (distinct survival
    * times, never subjects). Output per distinct duration:
    * (t, n_at_risk, n_events, n_censored, log_s_fp, survival_ppm).
    */
  def kaplanMeier(df: DataFrame, durationCol: String,
                  eventCol: Column): DataFrame = {
    val base = df.select(col(durationCol).cast("long").as("t"),
        eventCol.cast("boolean").as("__e"))
      .filter(col("t").isNotNull && col("t") >= 0 && col("__e").isNotNull)
    val byT = base.groupBy(col("t")).agg(
      sum(when(col("__e"), 1L).otherwise(0L)).as("n_events"),
      sum(when(col("__e"), 0L).otherwise(1L)).as("n_censored"))
    val wAll = Window.partitionBy(lit(1))
    val wPrev = Window.orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT
      .withColumn("__tot",
        sum(col("n_events") + col("n_censored")).over(wAll))
      .withColumn("__before", coalesce(
        sum(col("n_events") + col("n_censored")).over(wPrev), lit(0L)))
      .withColumn("n_at_risk", col("__tot") - col("__before"))
      .withColumn("__term",
        when(col("n_events") === 0 ||
          col("n_events") === col("n_at_risk"), lit(0L))
          .otherwise(floor(log(
            (col("n_at_risk") - col("n_events")).cast("double") /
              col("n_at_risk").cast("double")) * lit(1000000.0))
            .cast("long")))
      .withColumn("__dead", max(
        when(col("n_events") === col("n_at_risk"), 1).otherwise(0))
        .over(wCum))
      .withColumn("log_s_fp", sum(col("__term")).over(wCum))
      .select(col("t"), col("n_at_risk"), col("n_events"),
        col("n_censored"),
        when(col("__dead") === 1, lit(null).cast("long"))
          .otherwise(col("log_s_fp")).as("log_s_fp"),
        when(col("__dead") === 1, lit(0L))
          .otherwise(floor(exp(col("log_s_fp").cast("double") /
            lit(1000000.0)) * lit(1000000.0)).cast("long"))
          .as("survival_ppm"))
  }

  /** Trailing-window z-score outlier flags — streaming-style anomaly
    * detection on a per-series sequence: each point is compared to the
    * mean/σ of the PREVIOUS `window` points (self excluded — including
    * the point masks exactly the level shifts being hunted), flagged
    * when |x − μ| > z·σ. The sqrt never happens: with trailing sums
    * S1 = Σxᵢ, S2 = Σxᵢ² over n points, |x − S1/n| > z·σ multiplies out
    * to the exact integer inequality
    *   (n·x − S1)² > z²·(n·S2 − S1²)
    * evaluated in DECIMAL(38,0) (the cohensKappa ↔ HUGEINT mapping) —
    * no float, no tie risk beyond exact equality (strict >), identical
    * in both engines. [[graft.operators.Analytics]]'s groupZScores/MAD
    * flag outliers against the WHOLE group; this is the trailing-window
    * flavor that tracks drifting baselines.
    *
    * One exchange + per-partition sort per series (the window), then
    * row-local arithmetic. `idxCol` must be unique per series (the
    * repo-wide tiebreaker contract). Points with fewer than `minPoints`
    * predecessors report is_outlier NULL (no verdict), never false
    * confidence.
    *
    * Output: (keys…, idx, y_fp, n_win, win_sum, is_outlier).
    */
  def rollingZOutliers(df: DataFrame, keys: Seq[String], idxCol: String,
                       yFpCol: String, window: Int = 20, z: Int = 3,
                       minPoints: Int = 5): DataFrame = {
    require(keys.nonEmpty, "rollingZOutliers needs series keys")
    require(window >= 2 && window <= 10000,
      s"rollingZOutliers: window in [2, 10000], got $window")
    require(z >= 1 && z <= 100, s"rollingZOutliers: z in [1, 100], got $z")
    require(minPoints >= 2 && minPoints <= window,
      s"rollingZOutliers: minPoints in [2, window], got $minPoints")
    val kc = keys.map(col)
    val w = Window.partitionBy(kc: _*).orderBy(col("__i").asc)
      .rowsBetween(-window, -1)
    df.select(kc :+ col(idxCol).cast("long").as("__i")
        :+ col(yFpCol).cast("long").as("__y"): _*)
      .withColumn("__n", count(col("__y")).over(w))
      .withColumn("__s1", sum(col("__y")).over(w))
      .withColumn("__s2",
        sum(col("__y").cast("decimal(38,0)") * col("__y")).over(w))
      .select(kc :+ col("__i").as(idxCol) :+ col("__y").as("y_fp")
        :+ coalesce(col("__n"), lit(0L)).as("n_win")
        :+ coalesce(col("__s1"), lit(0L)).as("win_sum")
        :+ when(col("__n") >= minPoints,
            (col("__n").cast("decimal(38,0)") * col("__y") - col("__s1"))
              * (col("__n").cast("decimal(38,0)") * col("__y") - col("__s1"))
              > lit(z.toLong * z) * (col("__n").cast("decimal(38,0)")
                * col("__s2") - col("__s1").cast("decimal(38,0)") * col("__s1")))
          .as("is_outlier"): _*)
  }

  /** Watermark-lateness audit over a replayed stream — "how late does
    * this source actually deliver", the number that picks a streaming
    * watermark delay: with events replayed in arrival order (`arrivalCol`,
    * unique), each event's lateness is the running max event-time seen so
    * far minus its own event-time; an event is LATE when that exceeds
    * `thresholdUs` (it would be dropped by a watermark of that delay).
    *
    * One exchange + per-partition sort per stream for the running-max
    * window, one map-side-combinable rollup. Output per stream:
    * (stream, n_events, n_late, max_lateness_us, late_fp [ppm]).
    */
  def latenessAudit(df: DataFrame, streamCol: String,
                    arrivalCols: Seq[String], tsUsCol: String,
                    thresholdUs: Long): DataFrame = {
    require(thresholdUs >= 0, s"latenessAudit: threshold >= 0, got $thresholdUs")
    require(arrivalCols.nonEmpty,
      "latenessAudit needs a (unique) arrival ordering — end it with a tiebreaker")
    val ac = arrivalCols.indices.map(i => s"__a$i")
    val w = Window.partitionBy(col("stream"))
      .orderBy(ac.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(streamCol).as("stream")
        +: col(tsUsCol).cast("long").as("__ts")
        +: arrivalCols.zip(ac).map { case (c, a) => col(c).as(a) }: _*)
      .withColumn("__late", max(col("__ts")).over(w) - col("__ts"))
      .groupBy(col("stream"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("__late") > thresholdUs, 1L).otherwise(0L)).as("n_late"),
        max(col("__late")).as("max_lateness_us"))
      .withColumn("late_fp",
        expr("(n_late * CAST(1000000 AS BIGINT)) div n_events"))
  }

  /** [[latenessAudit]] swept across candidate watermark delays — the
    * table that PICKS the delay: one row per (stream, threshold) with
    * the drop rate that watermark would cause. Same single
    * running-max window pass; each event's lateness fans out to the
    * literal-bounded threshold list map-side (the thresholdSweep
    * pattern), one combinable agg.
    *
    * Output: (stream, threshold_us, n_events, n_late, late_fp).
    */
  def latenessSweep(df: DataFrame, streamCol: String,
                    arrivalCols: Seq[String], tsUsCol: String,
                    thresholdsUs: Seq[Long]): DataFrame = {
    require(thresholdsUs.nonEmpty &&
      thresholdsUs.distinct.size == thresholdsUs.size &&
      thresholdsUs.forall(_ >= 0),
      s"latenessSweep needs distinct non-negative thresholds: $thresholdsUs")
    val ac = arrivalCols.indices.map(i => s"__a$i")
    val w = Window.partitionBy(col("stream"))
      .orderBy(ac.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(streamCol).as("stream")
        +: col(tsUsCol).cast("long").as("__ts")
        +: arrivalCols.zip(ac).map { case (c, a) => col(c).as(a) }: _*)
      .withColumn("__late", max(col("__ts")).over(w) - col("__ts"))
      .withColumn("threshold_us",
        explode(array(thresholdsUs.map(lit): _*)))
      .groupBy(col("stream"), col("threshold_us"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("__late") > col("threshold_us"), 1L).otherwise(0L))
          .as("n_late"))
      .withColumn("late_fp",
        expr("(n_late * CAST(1000000 AS BIGINT)) div n_events"))
  }

  /** Linear interpolation of missing indices on a per-key spine — the
    * gap-filling companion of [[resampleFfill]] (which repeats the last
    * value; this draws the line between the surrounding observations):
    * for a missing index t between known (t₀,y₀) and (t₁,y₁),
    *   y = (y₀·(t₁−t) + y₁·(t−t₀)) div (t₁−t₀)
    * — exact integer arithmetic on fixed-point values (truncating
    * division, identical in both engines for either sign). Spine edges
    * with no observation on one side are dropped (no line exists).
    *
    * Shape: the per-key spine left-joins the observations, then ONE
    * exchange+sort serves both the backward last-known and forward
    * next-known windows (same partitioning, opposite frames). Output:
    * (keys…, idxCol, y_fp, interpolated).
    */
  def interpolateLinear(df: DataFrame, keys: Seq[String], idxCol: String,
                        yFpCol: String): DataFrame = {
    require(keys.nonEmpty, "interpolateLinear needs series keys")
    val kc = keys.map(col)
    val base = df.select(kc :+ col(idxCol).cast("long").as(idxCol)
      :+ col(yFpCol).cast("long").as("__y"): _*)
    val spine = base.groupBy(kc: _*)
      .agg(min(col(idxCol)).as("__mn"), max(col(idxCol)).as("__mx"))
      .select(kc :+ explode(sequence(col("__mn"), col("__mx"))).as(idxCol): _*)
    val joined = spine.join(base, keys :+ idxCol, "left")
    val part = org.apache.spark.sql.expressions.Window.partitionBy(kc: _*)
    val wPrev = part.orderBy(col(idxCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = part.orderBy(col(idxCol).asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val known = when(col("__y").isNotNull,
      struct(col(idxCol).as("t"), col("__y").as("y")))
    joined
      .withColumn("__p", last(known, ignoreNulls = true).over(wPrev))
      .withColumn("__n", first(known, ignoreNulls = true).over(wNext))
      .filter(col("__p").isNotNull && col("__n").isNotNull)
      .select(kc ++ Seq(col(idxCol),
        when(col("__y").isNotNull, col("__y")).otherwise(
          expr(s"(__p.y * (__n.t - $idxCol) + __n.y * ($idxCol - __p.t))" +
            " div (__n.t - __p.t)")).as("y_fp"),
        col("__y").isNull.as("interpolated")): _*)
  }

  /** Time-weighted average value per key — the TWAP/duration-weighted
    * metric ("average price while it was in effect", "mean fleet size"):
    * each observation holds from its timestamp until the NEXT observation
    * of the same key, and the average weights values by held microseconds:
    *   twa = Σ centsᵢ·durᵢ / Σ durᵢ.
    * The key's last observation has no observed duration and is excluded
    * (its value never demonstrably held) — n_intervals counts the closed
    * intervals that did.
    *
    * Exact: durations are epoch-µs longs, cents·µs products accumulate in
    * DECIMAL(38,0) (a $10⁴ value held for a year is ~3·10¹⁹ — past signed
    * longs), and the final division is integer floor on non-negative
    * sums, yielding cents. One exchange + per-partition sort for the
    * `lead` (ordered by (ts, tie) — the unique-tiebreak contract), one
    * map-side-combinable agg.
    *
    * Output: (keys…, n_intervals, total_us, twa_cents).
    */
  def timeWeightedAvg(df: DataFrame, keys: Seq[String], tsUsCol: String,
                      tieCol: String, centsCol: String): DataFrame = {
    require(keys.nonEmpty, "timeWeightedAvg needs keys")
    val dec = "decimal(38,0)"
    df.select(keys.map(col) :+ col(tsUsCol).cast("long").as("__ts")
        :+ col(tieCol).as("__tie") :+ col(centsCol).cast("long").as("__c"): _*)
      .withColumn("__next", lead(col("__ts"), 1).over(
        Window.partitionBy(keys.map(col): _*)
          .orderBy(col("__ts").asc, col("__tie").asc)))
      .filter(col("__next").isNotNull)
      .withColumn("__dur", col("__next") - col("__ts"))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("__dur")).as("total_us"),
        sum(col("__c").cast(dec) * col("__dur").cast(dec)).as("__cd"))
      .filter(col("total_us") > 0)
      .select(keys.map(col) ++ Seq(col("n_intervals"), col("total_us"),
        expr("CAST(__cd div CAST(total_us AS DECIMAL(38,0)) AS BIGINT)")
          .as("twa_cents")): _*)
  }
}
