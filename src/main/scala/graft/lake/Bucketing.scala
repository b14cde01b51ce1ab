package graft.lake

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Hive-style bucketed tables — the CO-LOCATED JOIN primitive: write both
  * sides of a hot join bucketed (and sorted) on the join key ONCE, and
  * every subsequent join between them runs with NO exchange on either
  * side — the scan itself provides the hash partitioning, so a
  * fact-to-fact join that would shuffle 100 TB per run instead shuffles
  * nothing, forever. The write pays one clustering shuffle up front;
  * `sortBy` additionally removes the per-join sort, leaving pure
  * streaming merge.
  *
  * This is the "bucketing" leg of the broadcast/repartition/bucketing
  * co-location triad (the other two are
  * [[graft.operators.Relations.saltedJoin]]'s explicit salting and the
  * session AQE config). BucketingSpec pins the plan contract: a join of
  * two same-bucketed tables contains zero ShuffleExchange nodes even
  * with broadcast disabled; q241 gates the joined RESULT against the
  * plain-join oracle, proving bucketing changed the plan and nothing
  * else.
  */
object Bucketing {

  /** Write `df` as a bucketed (optionally sorted) catalog table at an
    * explicit path (external table — survives catalog resets, lives
    * where the caller's lake lives). Existing table of the same name is
    * replaced.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketCol: String, nBuckets: Int,
                    sortCols: Seq[String] = Nil): Unit = {
    require(nBuckets >= 1 && nBuckets <= 100000,
      s"writeBucketed: nBuckets in [1, 100000], got $nBuckets")
    df.sparkSession.sql(s"DROP TABLE IF EXISTS `$table`")
    val w = df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
     else w)
      .format("parquet").saveAsTable(table)
  }

  /** Inner equi-join of two bucketed catalog tables on `key` — plain
    * DataFrame join; the exchange-free plan comes from the tables'
    * bucket metadata, not from anything special here (that is the
    * point: co-location is a LAYOUT property, transparent to queries).
    */
  def bucketedJoin(spark: SparkSession, tableA: String, tableB: String,
                   key: String): DataFrame =
    spark.table(tableA).join(spark.table(tableB), Seq(key))
}
