package graft.functions

import graft.SparkSpec
import graft.ml.Similarity
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** The native sign-LSH bucketing must be bit-identical to the HOF
  * reference formulation (Similarity.signBucket) in both the codegen'd
  * DataFrame path and direct interpreted eval — the q42/q52 oracles
  * depend on these exact bucket values.
  */
class SignLshBucketsSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 8
  private def vec(seed: Long): Array[Float] =
    Array.tabulate(dims)(d => (((seed * 31 + d * 7) % 17).toFloat - 8) / 3f)

  test("codegen path equals the HOF signBucket for every (table, vector)") {
    val df = (0L until 40L).map(i => (i, vec(i))).toDF("id", "v")
    SignLshBuckets.register(spark)
    val native = df.select(col("id"),
      posexplode(SignLshBuckets.buckets(col("v"), 3, 5, dims)))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val hof = (0 until 3).flatMap { t =>
      df.select(col("id"), Similarity.signBucket(col("v"), 5, dims, t).as("b"))
        .collect().map(r => (r.getLong(0), t) -> r.getLong(1))
    }.toMap
    assert(native == hof)
  }

  test("interpreted eval matches codegen results; ragged input yields null") {
    val expr = SignLshBuckets(BoundReference(0, ArrayType(FloatType), nullable = true), 3, 5, dims)
    val v = vec(7L)
    val interpreted = expr.nullSafeEval(
      new GenericArrayData(v.map(x => x: Any))).asInstanceOf[ArrayData].toLongArray.toSeq
    SignLshBuckets.register(spark)
    val viaDf = Seq(Tuple1(v)).toDF("v")
      .select(SignLshBuckets.buckets(col("v"), 3, 5, dims)).head
      .getAs[scala.collection.Seq[Long]](0).toSeq
    assert(interpreted == viaDf)
    assert(expr.nullSafeEval(new GenericArrayData(Array[Any](1.0f, 2.0f))) == null)
    assert(expr.nullable, "ragged-NULL contract requires nullable=true")
  }

  test("non-literal shape arguments are rejected with a clear error") {
    SignLshBuckets.register(spark)
    val df = Seq((vec(1L), 3)).toDF("v", "n")
    val err = intercept[Exception] {
      df.select(call_function(SignLshBuckets.FunctionName,
        col("v"), col("n"), lit(5), lit(dims))).head
    }
    assert(err.getMessage.contains("literal"), err.getMessage)
  }

  test("plane components equal the oracle md5 scheme spot-checks") {
    // independently recompute hp-1-2-3 the way the DuckDB oracle does
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("hp-1-2-3".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    val expect = (java.lang.Long.parseLong(hex, 16) % 2000003L).toDouble / 1000001.5 - 1.0
    assert(SignLshBuckets.plane(1, 2, 3) == expect)
  }
}
