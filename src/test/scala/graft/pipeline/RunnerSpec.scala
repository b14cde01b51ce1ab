package graft.pipeline

import graft.SparkSpec
import graft.sources.Tables
import java.nio.file.Files

/** End-to-end medallion composition: bronze→silver→gold lands the same
  * fact as the direct query, quality gates pass, rerun is a no-op.
  */
class RunnerSpec extends SparkSpec {

  test("bronze→silver→gold equals the direct gold query; rerun is idempotent") {
    val dir = Files.createTempDirectory("graft-runner").toString
    val events = Tables.events(spark, sfDir)
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val r1 = Runner.run(spark, events, dir)
    assert(r1.qualityFailures.isEmpty, r1.qualityFailures.mkString("; "))
    // materialize before the rerun: the atomic swap replaces the files a
    // lazy reader has already listed
    val gold1 = canon(r1.gold)
    assert(gold1 == canon(Medallion.salesMinute(events)),
      "pipeline gold must equal the direct aggregation")
    val r2 = Runner.run(spark, events, dir)
    assert(canon(r2.gold) == gold1, "rerun must be a no-op")
    spark.sql("DROP TABLE IF EXISTS bronze_raw.events_raw")
  }
}
