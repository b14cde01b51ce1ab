package graft.lake

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the Delta-MERGE emulation (SURVEY §2.1 S4, Q10):
  * idempotence, latest-wins under duplicates, insert-vs-update semantics.
  * (ScalaCheck generators driven by fixed seeds — the scalatest-scalacheck
  * bridge artifact isn't in the offline cache.)
  */
class UpsertSpec extends SparkSpec {
  import org.apache.spark.sql.{DataFrame, Row}
  import org.apache.spark.sql.types._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("ver", LongType),
    StructField("payload", StringType)))

  private def df(rows: Seq[(Long, Long, String)]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3)), 2), schema)

  private def collectSet(d: DataFrame): Set[(Long, Long, String)] =
    d.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  private val rowGen = for {
    k <- Gen.choose(0L, 20L); v <- Gen.choose(0L, 5L)
  } yield (k, v, s"p$k-$v")
  private val batchGen = Gen.listOfN(30, rowGen)

  private def sample(seed: Long): Seq[(Long, Long, String)] =
    batchGen.apply(Gen.Parameters.default, Seed(seed)).get

  test("upsert is idempotent: applying the same batch twice equals once") {
    for (seed <- 1 to 5) {
      val target = Upsert.latestWins(df(sample(seed)), Seq("k"), Seq("ver", "payload"))
      val source = df(sample(seed + 100))
      val once = Upsert.merge(target, source, Seq("k"), Seq("ver", "payload"))
      val twice = Upsert.merge(once, source, Seq("k"), Seq("ver", "payload"))
      assert(collectSet(once) == collectSet(twice), s"seed=$seed")
    }
  }

  test("upserted keys are unique and drawn from target ∪ source") {
    for (seed <- 1 to 5) {
      val target = Upsert.latestWins(df(sample(seed)), Seq("k"), Seq("ver", "payload"))
      val source = df(sample(seed + 100))
      val merged = Upsert.merge(target, source, Seq("k"), Seq("ver", "payload"))
      val keys = merged.select("k").collect().map(_.getLong(0))
      assert(keys.distinct.length == keys.length, s"seed=$seed: duplicate keys")
      val expected = (sample(seed).map(_._1) ++ sample(seed + 100).map(_._1)).toSet
      assert(keys.toSet == expected, s"seed=$seed: key set mismatch")
    }
  }

  test("latest-wins keeps exactly the max-ordering row per key") {
    val d = df(Seq((1L, 1L, "old"), (1L, 2L, "new"), (2L, 5L, "only")))
    assert(collectSet(Upsert.latestWins(d, Seq("k"), Seq("ver"))) ==
      Set((1L, 2L, "new"), (2L, 5L, "only")))
  }

  test("merge updates matched keys and inserts new ones") {
    val target = df(Seq((1L, 1L, "t1"), (2L, 1L, "t2")))
    val source = df(Seq((2L, 9L, "s2"), (3L, 1L, "s3")))
    assert(collectSet(Upsert.merge(target, source, Seq("k"), Seq("ver"))) ==
      Set((1L, 1L, "t1"), (2L, 9L, "s2"), (3L, 1L, "s3")))
  }

  test("mergeIntoPath swaps atomically and is rerun-safe") {
    val dir = java.nio.file.Files.createTempDirectory("upsert").toString + "/tbl"
    Upsert.mergeIntoPath(spark, dir, df(Seq((1L, 1L, "a"))), Seq("k"), Seq("ver"))
    Upsert.mergeIntoPath(spark, dir, df(Seq((1L, 2L, "b"), (2L, 1L, "c"))), Seq("k"), Seq("ver"))
    Upsert.mergeIntoPath(spark, dir, df(Seq((1L, 2L, "b"), (2L, 1L, "c"))), Seq("k"), Seq("ver"))
    assert(collectSet(spark.read.parquet(dir)) == Set((1L, 2L, "b"), (2L, 1L, "c")))
  }
}
