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

  /** Build a local session sized from SPARK_GRAFT_CPUS (driver contract). */
  def local(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    configure(spark)
    spark
  }

  /** Apply graft's runtime confs to an existing session (idempotent).
    *
    * Safe to call on a driver-provided session: all of these are
    * runtime-settable SQL confs, not static Spark confs.
    */
  def configure(spark: SparkSession): SparkSession = {
    // /root/testdata/*/events.parquet stores INT64 TIMESTAMP(NANOS) which
    // Spark cannot read natively (PARQUET_TYPE_ILLEGAL); read as long and
    // convert in Tables.events.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Adaptive execution: runtime coalescing of shuffle partitions and
    // skew-join splitting — essential at 100 TB where static partition
    // counts are always wrong for some stage.
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
