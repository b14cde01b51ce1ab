package graft.functions

import graft.SparkSpec
import graft.text.TextDedup
import org.apache.spark.sql.functions._

/** Native MinHash expression: codegen/interpreted parity, determinism,
  * monotone-under-union (the defining minhash property), and the plan
  * shape it buys (signature step with no exchange).
  */
class MinHashSignatureSpec extends SparkSpec {
  import spark.implicits._

  private def sigOf(rows: Seq[Seq[Long]], n: Int = 16): Array[Array[Long]] = {
    MinHashSignature.register(spark)
    rows.toDF("sh")
      .select(MinHashSignature.minhashSignature(col("sh"), n).as("sig"))
      .collect().map(_.getSeq[Long](0).toArray)
  }

  test("codegen and interpreted paths agree") {
    val data = Seq(Seq(1L, 2L, 3L), Seq(42L), Seq(-7L, 9L, 1000L, 3L))
    val viaCodegen = sigOf(data)
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = sigOf(data)
      assert(viaCodegen.zip(interpreted).forall { case (a, b) => a.sameElements(b) })
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("signature of a union is the element-wise min of the signatures") {
    val a = Seq(5L, 17L, 923L)
    val b = Seq(10000L, 31L)
    val Array(sa, sb, sab) = sigOf(Seq(a, b, a ++ b))
    assert(sab.indices.forall(j => sab(j) == math.min(sa(j), sb(j))))
  }

  test("deterministic across runs and input order") {
    val Array(x, y) = sigOf(Seq(Seq(1L, 2L, 3L), Seq(3L, 1L, 2L)))
    assert(x.sameElements(y), "minhash must be set-order-independent")
  }

  test("minhashBands is a map-only stage: no exchange before the band explode") {
    val sh = TextDedup.shingleHashedDocs(
      graft.sources.Tables.documents(spark, sfDir), "doc_id", "text", 3)
    val plan = TextDedup.minhashBands(sh, 16, 4).queryExecution.executedPlan.toString
    val exchanges = plan.split("\n").count(l =>
      l.contains("Exchange") && !l.contains("REPARTITION_BY_NUM"))
    assert(exchanges == 0,
      s"signature computation must not shuffle (only the reader repartition):\n$plan")
  }
}
