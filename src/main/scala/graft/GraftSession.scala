package graft

import org.apache.spark.sql.SparkSession

/** Session construction + the runtime confs every graft job relies on.
  *
  * Designed for a 1000-executor cluster but tested on `local[N]`: the knobs
  * set here (AQE, skew-join handling, small shuffle-partition count locally)
  * are the ones that matter at both scales. On a real cluster the caller
  * overrides `spark.sql.shuffle.partitions` upward; everything else holds.
  */
object GraftSession {

  /** Parallelism from SPARK_GRAFT_CPUS (driver contract), validated. */
  def cpus: Int = {
    val raw = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    raw.toIntOption.filter(_ > 0).getOrElse {
      throw new IllegalArgumentException(
        s"SPARK_GRAFT_CPUS must be a positive integer, got '$raw'")
    }
  }

  /** Build a local session sized from SPARK_GRAFT_CPUS (driver contract). */
  def local(appName: String = "graft"): SparkSession = {
    val n = cpus
    val spark = SparkSession
      .builder()
      .master(s"local[$n]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", n)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    if (spark.sparkContext.master != s"local[$n]")
      System.err.println(
        s"[graft] WARNING: reusing pre-existing session with master " +
          s"${spark.sparkContext.master}; local[$n] request ignored")
    configure(spark)
  }

  /** Apply graft's runtime confs to an existing session (idempotent).
    *
    * Safe to call on a driver-provided session: all of these are
    * runtime-settable SQL confs, not static Spark confs.
    */
  def configure(spark: SparkSession): SparkSession = {
    // Older testdata generations store events.ts as INT64 TIMESTAMP(NANOS),
    // which Spark cannot read natively (PARQUET_TYPE_ILLEGAL); with this
    // conf it reads as a long of nanos and sources.Tables.events converts.
    // Newer generations ship plain timestamp[us], where the conf is inert
    // (Tables.events branches on the read schema either way).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Adaptive execution: runtime coalescing of shuffle partitions and
    // skew-join splitting — essential at 100 TB where static partition
    // counts are always wrong for some stage.
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // InferFiltersFromGenerate turns every explode(arr) into a pushable
    // `size(arr) > 0` predicate. When `arr` is an expensive computed array
    // (hashed shingles: per-token xxhash64 + n-gram transform), pushdown
    // substitutes the WHOLE expression into a Filter at the scan — before
    // any repartition — re-running the quadratic interpreted lambda once
    // per row on a single input split. Our explodes are always over
    // computed arrays, never over prunable source columns, so the rule
    // only ever costs us; drop it.
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
    // Parquet field-id resolution: id-mode column-mapped Delta tables
    // match columns by the footer's field ids, not names — the read
    // side needs the flag on (inert for schemas without
    // `parquet.field.id` metadata), and the write side stamps ids so
    // external id-mode readers can open what we write.
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
