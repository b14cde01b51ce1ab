package graft.functions

import graft.SparkSpec
import graft.ml.Similarity
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** The native PQ expressions must equal the expression-tree reference
  * (Similarity.pqBest / pqDist — the q82/q83 oracle scheme) bit-for-bit
  * in both the codegen'd DataFrame path and direct interpreted eval.
  */
class PqBestsSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 64
  private val m = 8
  private val k = 8
  private val sub = dims / m

  private def vec(seed: Long): Array[Float] =
    Array.tabulate(dims)(d => (((seed * 37 + d * 11) % 19).toFloat - 9) / 4f)

  /** Tree reference: per-subspace lexicographic array_min over
    * (left-to-right folded dist, code) structs.
    */
  private def treeBests(v: org.apache.spark.sql.Column) =
    array((0 until m).map(s => Similarity.pqBest(v, s, k, sub)): _*)

  private def treeLut(v: org.apache.spark.sql.Column) =
    array((0 until m).map(s =>
      array((0 until k).map(c => Similarity.pqDist(v, s, c, sub)): _*)): _*)

  test("pq_bests codegen path equals the tree argmin for every subspace") {
    val df = (0L until 40L).map(i => Tuple1(vec(i))).toDF("v")
    PqBests.register(spark)
    val native = df.select(PqBests.bests(col("v"), m, k, dims)).collect()
      .map(_.getAs[scala.collection.Seq[Row]](0)
        .map(r => (r.getDouble(0), r.getInt(1))).toSeq)
    val tree = df.select(treeBests(col("v"))).collect()
      .map(_.getAs[scala.collection.Seq[Row]](0)
        .map(r => (r.getDouble(0), r.getInt(1))).toSeq)
    assert(native.toSeq == tree.toSeq)
  }

  test("pq_adc_lut codegen path equals the tree distance tables") {
    val df = (0L until 40L).map(i => Tuple1(vec(i))).toDF("v")
    PqAdcLut.register(spark)
    val native = df.select(PqAdcLut.lut(col("v"), m, k, dims)).collect()
      .map(_.getAs[scala.collection.Seq[scala.collection.Seq[Double]]](0)
        .map(_.toSeq).toSeq)
    val tree = df.select(treeLut(col("v"))).collect()
      .map(_.getAs[scala.collection.Seq[scala.collection.Seq[Double]]](0)
        .map(_.toSeq).toSeq)
    assert(native.toSeq == tree.toSeq)
  }

  test("interpreted eval matches; ragged input yields null; nullable declared") {
    val bexpr = PqBests(BoundReference(0, ArrayType(FloatType), nullable = true),
      m, k, dims)
    val v = vec(7L)
    val interp = bexpr.nullSafeEval(new GenericArrayData(v.map(x => x: Any)))
      .asInstanceOf[ArrayData]
    PqBests.register(spark)
    val viaDf = Seq(Tuple1(v)).toDF("v")
      .select(PqBests.bests(col("v"), m, k, dims)).head()
      .getAs[scala.collection.Seq[Row]](0)
      .map(r => (r.getDouble(0), r.getInt(1))).toSeq
    val interpPairs = (0 until interp.numElements()).map { i =>
      val r = interp.getStruct(i, 2); (r.getDouble(0), r.getInt(1))
    }
    assert(interpPairs == viaDf)
    assert(bexpr.nullSafeEval(new GenericArrayData(Array[Any](1.0f))) == null)
    assert(bexpr.nullable)
    val lexpr = PqAdcLut(BoundReference(0, ArrayType(FloatType), nullable = true),
      m, k, dims)
    assert(lexpr.nullSafeEval(new GenericArrayData(Array[Any](1.0f))) == null)
    assert(lexpr.nullable)
  }

  test("argmin ties fall to the smaller code (oracle ORDER BY dist, k)") {
    // All-zero vector against a codebook where two codes tie is hard to
    // fixture via md5 — instead pin the comparator contract directly:
    // the tree form's array_min over (d, k) structs and the native loop
    // must agree on EVERY sampled vector, which the first test asserts
    // per subspace including any incidental ties. Here additionally pin
    // determinism: repeated evaluation returns identical bits.
    val df = Seq(Tuple1(vec(13L))).toDF("v")
    PqBests.register(spark)
    val a = df.select(PqBests.bests(col("v"), m, k, dims)).collect()
    val b = df.select(PqBests.bests(col("v"), m, k, dims)).collect()
    assert(a.toSeq == b.toSeq)
  }

  test("codebook components equal the oracle md5 scheme spot-check") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("pq-3-5-2".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    val expect = (java.lang.Long.parseLong(hex, 16) % 2000003L).toDouble / 1000001.5 - 1.0
    assert(PqCodebook.component(3, 5, 2) == expect)
  }
}
