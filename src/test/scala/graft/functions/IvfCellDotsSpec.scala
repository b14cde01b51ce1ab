package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Native IVF cell dots must equal the HOF zip_with/aggregate fold
  * bit-for-bit (q51's oracle reproduces these exact doubles) in both the
  * codegen'd DataFrame path and direct interpreted eval.
  */
class IvfCellDotsSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 8
  private def vec(seed: Long): Array[Float] =
    Array.tabulate(dims)(d => (((seed * 37 + d * 11) % 19).toFloat - 9) / 4f)

  /** HOF reference: left-to-right double fold over literal centroids. */
  private def hofDots(v: org.apache.spark.sql.Column, cells: Int) =
    array((0 until cells).map { c =>
      aggregate(
        zip_with(v, array((0 until dims).map(d => lit(IvfCellDots.centroid(c, d))): _*),
          (x, h) => x.cast("double") * h),
        lit(0.0), (acc, x) => acc + x)
    }: _*)

  test("codegen path equals the HOF fold for every (cell, vector)") {
    val df = (0L until 30L).map(i => Tuple1(vec(i))).toDF("v")
    IvfCellDots.register(spark)
    val native = df.select(IvfCellDots.cellDots(col("v"), 6, dims)).collect()
      .map(_.getAs[scala.collection.Seq[Double]](0).toSeq)
    val hof = df.select(hofDots(col("v"), 6)).collect()
      .map(_.getAs[scala.collection.Seq[Double]](0).toSeq)
    assert(native.toSeq == hof.toSeq)
  }

  test("interpreted eval matches; ragged input yields null; nullable declared") {
    val expr = IvfCellDots(BoundReference(0, ArrayType(FloatType), nullable = true), 6, dims)
    val v = vec(5L)
    val interpreted = expr.nullSafeEval(new GenericArrayData(v.map(x => x: Any)))
      .asInstanceOf[ArrayData].toDoubleArray().toSeq
    IvfCellDots.register(spark)
    val viaDf = Seq(Tuple1(v)).toDF("v")
      .select(IvfCellDots.cellDots(col("v"), 6, dims)).head()
      .getAs[scala.collection.Seq[Double]](0).toSeq
    assert(interpreted == viaDf)
    assert(expr.nullSafeEval(new GenericArrayData(Array[Any](1.0f))) == null)
    assert(expr.nullable)
  }

  test("centroid components equal the oracle md5 scheme spot-check") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("ivf-3-5".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    val expect = (java.lang.Long.parseLong(hex, 16) % 2000003L).toDouble / 1000001.5 - 1.0
    assert(IvfCellDots.centroid(3, 5) == expect)
  }
}
