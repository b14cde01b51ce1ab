package graft.lake

import graft.SparkSpec
import graft.ml.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generated property tests (SURVEY §5 rebuild test plan):
  * merge idempotence / latest-wins / key-union over random tables with
  * duplicate keys and ties, and two-stage top-k ≡ single-window top-k.
  * Deterministic seeds so failures reproduce.
  */
class UpsertPropertiesSpec extends SparkSpec {
  import spark.implicits._

  /** (key, version, payload) rows with deliberately colliding keys. */
  private val rowsGen: Gen[List[(Long, Long, Long)]] =
    Gen.listOfN(40, Gen.zip(
      Gen.chooseNum(0L, 7L), Gen.chooseNum(0L, 4L), Gen.chooseNum(0L, 999L)))

  private def sample(i: Int): (DataFrame, DataFrame) = {
    val mk = (s: Long) => rowsGen(Gen.Parameters.default, Seed(s)).get
    (mk(2L * i).toDF("k", "ver", "p"), mk(2L * i + 1).toDF("k", "ver", "p"))
  }

  private def canon(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("merge is idempotent for arbitrary target/source batches") {
    for (i <- 0 until 6) {
      val (t, s) = sample(i)
      val once = Upsert.merge(t, s, Seq("k"), Seq("ver", "p"))
      val twice = Upsert.merge(once, s, Seq("k"), Seq("ver", "p"))
      assert(canon(once) == canon(twice), s"sample $i not idempotent")
    }
  }

  test("merged keys are target-keys ∪ source-keys, one row each") {
    for (i <- 6 until 12) {
      val (t, s) = sample(i)
      val m = Upsert.merge(t, s, Seq("k"), Seq("ver", "p"))
      val keys = m.select("k").collect().map(_.getLong(0))
      assert(keys.length == keys.distinct.length, s"sample $i dup keys")
      val expected = (canon(t).map(_._1) ++ canon(s).map(_._1))
      assert(keys.toSet == expected, s"sample $i key set")
    }
  }

  test("source keys carry the source's latest row; source-absent keys keep target's latest") {
    for (i <- 12 until 18) {
      val (t, s) = sample(i)
      val m = canon(Upsert.merge(t, s, Seq("k"), Seq("ver", "p")))
      val bestOf = (rows: Set[(Long, Long, Long)]) =>
        rows.groupBy(_._1).map { case (k, g) => k -> g.maxBy(r => (r._2, r._3)) }
      val (bt, bs) = (bestOf(canon(t)), bestOf(canon(s)))
      val expected = (bt ++ bs).values.toSet
      assert(m == expected, s"sample $i latest-wins")
    }
  }

  test("schema evolution: source with an added column null-fills old rows; dropped column survives") {
    for (i <- 22 until 26) {
      val (t, s0) = sample(i)
      val s = s0.withColumn("extra", col("p") * 2)
      val m = Upsert.merge(t, s, Seq("k"), Seq("ver", "p"))
      assert(m.columns.toSet == Set("k", "ver", "p", "extra"))
      val rows = m.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2),
         if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
      val bestOf = (xs: Set[(Long, Long, Long)]) =>
        xs.groupBy(_._1).map { case (k, g) => k -> g.maxBy(x => (x._2, x._3)) }
      val (bt, bs) = (bestOf(canon(t)), bestOf(canon(s0)))
      val expected = (bt.map { case (k, r) => k -> ((r._1, r._2, r._3, None: Option[Long])) } ++
        bs.map { case (k, r) => k -> ((r._1, r._2, r._3, Some(r._3 * 2))) }).values.toSet
      assert(rows == expected, s"sample $i evolved-merge mismatch")
      // The reverse direction: a source MISSING a target column keeps the
      // column; every key the source touches now carries null there, and
      // source-absent keys keep their previous value.
      val m2 = Upsert.merge(m, s0, Seq("k"), Seq("ver", "p"))
      assert(m2.columns.toSet == Set("k", "ver", "p", "extra"))
      val rows2 = m2.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2),
         if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
      val sourceKeys = canon(s0).map(_._1)
      val expected2 = rows.map {
        case (k, _, _, _) if sourceKeys(k) =>
          val b = bs(k); (k, b._2, b._3, None: Option[Long])
        case keep => keep
      }
      assert(rows2 == expected2, s"sample $i reverse-evolution mismatch")
    }
  }

  test("merge rejects a key/ordering column absent from one side") {
    val (t, s) = sample(30)
    val err = intercept[IllegalArgumentException] {
      Upsert.merge(t, s.drop("ver"), Seq("k"), Seq("ver", "p"))
    }
    assert(err.getMessage.contains("ver"))
  }

  test("two-stage salted topKPerKey equals the single-window top-k") {
    for (i <- 18 until 22) {
      val df = rowsGen(Gen.Parameters.default, Seed(i.toLong)).get
        .toDF("k", "ver", "p").withColumn("uid", monotonically_increasing_id())
      val ordering = Seq(col("ver").desc, col("p").desc, col("uid").asc)
      val fast = Similarity.topKPerKey(df, col("k"), ordering, 3, col("uid"))
        .select("k", "uid", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val w = Window.partitionBy(col("k")).orderBy(ordering: _*)
      val naive = df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3).select("k", "uid", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(fast == naive, s"sample $i top-k mismatch")
    }
  }
}
