package graft.text

import graft.SparkSpec

class LinkageSpec extends SparkSpec {

  import Linkage.FieldSpec

  test("FieldSpec weights: log-likelihood signs and exact fixed-point") {
    val f = FieldSpec("x", "a", "b", m = 0.9, u = 0.1)
    // log2(9) = 3.1699...; log2(0.1/0.9) = -3.1699...
    assert(f.agreeFp == math.round(math.log(9.0) / math.log(2.0) * (1L << 20)))
    assert(f.agreeFp > 0 && f.disagreeFp < 0)
    assert(f.agreeFp == -f.disagreeFp) // symmetric for this m/u pair
    intercept[IllegalArgumentException](FieldSpec("bad", "a", "b", 0.1, 0.9))
  }

  test("fellegiSunter: banded decisions from exact score sums") {
    val s = spark; import s.implicits._
    val fields = Seq(
      FieldSpec("name", "name_a", "name_b", 0.9, 0.1), // ±3.17 ~ ±3323857fp
      FieldSpec("city", "city_a", "city_b", 0.8, 0.2)) // +2.0 / -2.0
    val agreeN = fields(0).agreeFp
    val agreeC = fields(1).agreeFp
    val disC = fields(1).disagreeFp
    val left = Seq((1L, "b1", "ann", "rome"), (2L, "b1", "bob", "oslo"),
      (3L, "b2", "cid", "lima")).toDF("id_a", "blk", "name_a", "city_a")
    val right = Seq((10L, "b1", "ann", "rome"), (11L, "b1", "ann", "kiev"),
      (12L, "b3", "cid", "lima")).toDF("id_b", "blk", "name_b", "city_b")
    val out = Linkage.fellegiSunter(left, right, "id_a", "id_b", "blk",
        fields, lowerFp = 0L, upperFp = agreeN + agreeC)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // (1,10): both agree -> 'match' at exactly the upper threshold
    assert(out((1L, 10L)) == ((2L, agreeN + agreeC, "match")))
    // (1,11): name agrees, city not -> positive but below upper
    assert(out((1L, 11L)) == ((1L, agreeN + disC, "possible")))
    // (2,10)/(2,11): nothing agrees -> dropped; (3,12): different block
    assert(out.size == 2)
  }

  test("goldenRecord: majority wins, ties break lexicographically, NULLs lose") {
    val s = spark; import s.implicits._
    val recs = Seq(
      (1L, "ann", "rome"), (1L, "ann", "roma"), (1L, "ANN", "rome"),
      (2L, "bob", null), (2L, null, null),
      (3L, "cid", "lima"), (3L, "dan", "lima")) // name tie: cid < dan
      .toDF("cluster", "name", "city")
    val got = Linkage.goldenRecord(recs, "cluster", Seq("name", "city"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), Option(r.getString(2))))).toMap
    assert(got(1L) == ((Some("ann"), Some("rome"))))
    assert(got(2L) == ((Some("bob"), None))) // all-NULL field stays NULL
    assert(got(3L) == ((Some("cid"), Some("lima"))))
  }

  test("fellegiSunter: NULL fields never agree") {
    val s = spark; import s.implicits._
    val fields = Seq(FieldSpec("v", "v_a", "v_b", 0.9, 0.1))
    val left = Seq((1L, "b", Option.empty[String])).toDF("id_a", "blk", "v_a")
    val right = Seq((2L, "b", Option.empty[String])).toDF("id_b", "blk", "v_b")
    // NULL = NULL is not agreement: score is the disagree weight, dropped
    // by any non-negative lower threshold
    assert(Linkage.fellegiSunter(left, right, "id_a", "id_b", "blk",
      fields, 0L, 1L).count() == 0)
  }
}
