package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelationsSpec extends SparkSpec {
  import spark.implicits._

  test("unionRelations null-fills the column superset and stamps lineage") {
    val a = Seq((1L, "x")).toDF("id", "only_a")
    val b = Seq((2L, 3.5)).toDF("id", "only_b")
    val u = Relations.unionRelations(Seq("a" -> a, "b" -> b))
    assert(u.columns.toSeq == Seq("id", "only_a", "only_b", "_source_relation"))
    val rows = u.orderBy("id").collect()
    assert(rows(0).getString(1) == "x" && rows(0).isNullAt(2)
      && rows(0).getString(3) == "a")
    assert(rows(1).isNullAt(1) && rows(1).getDouble(2) == 3.5
      && rows(1).getString(3) == "b")
  }

  test("unionRelations widens a shared column to the common type (INT+BIGINT -> BIGINT)") {
    val a = Seq(1).toDF("x")                       // IntegerType, first seen
    val b = Seq(3000000000L).toDF("x")             // BigintType, wider
    val u = Relations.unionRelations(Seq("a" -> a, "b" -> b))
    assert(u.schema("x").dataType == org.apache.spark.sql.types.LongType,
      s"expected widened bigint, got ${u.schema("x").dataType}")
    assert(u.select(sum(col("x"))).head.getLong(0) == 3000000001L)
  }

  test("paginate returns the requested stable page") {
    val df = (1 to 50).map(i => (i.toLong, s"r$i")).toDF("id", "v")
    val page = Relations.paginate(df, Seq(col("id")), 10, 5).collect()
    assert(page.map(_.getLong(0)).toSeq == Seq(11L, 12L, 13L, 14L, 15L))
  }

  test("safeDivide yields null on zero denominator, not an error") {
    val r = Seq((10.0, 2.0), (1.0, 0.0)).toDF("a", "b")
      .select(Relations.safeDivide(col("a"), col("b")).as("q")).collect()
    assert(r(0).getDouble(0) == 5.0 && r(1).isNullAt(0))
  }

  test("url helpers parse host/path/parameter") {
    val r = Seq("https://shop.example.com/p/42?ref=mail&x=1").toDF("u")
      .select(Relations.urlHost(col("u")), Relations.urlPath(col("u")),
        Relations.urlParameter(col("u"), "ref")).head
    assert(r.getString(0) == "shop.example.com")
    assert(r.getString(1) == "/p/42")
    assert(r.getString(2) == "mail")
  }

  test("saltedJoin equals the plain join on skewed data") {
    // 1000 rows of one hot key + a tail, joined to a small dim
    val skewed = ((1 to 1000).map(i => (7L, i.toLong)) ++
      (1 to 50).map(i => (i.toLong % 5, i.toLong))).toDF("k", "payload")
    val dim = (0L to 9L).map(k => (k, s"dim$k")).toDF("k", "attr")
    val plain = skewed.join(dim, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = Relations.saltedJoin(skewed, dim, "k", saltFactor = 8)
      .select("k", "payload", "attr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain)
  }

  test("safeAdd/safeSubtract treat nulls as zero unless all-null") {
    val r = Seq((Some(1.0), Some(2.0)), (None, Some(3.0)),
      (None: Option[Double], None: Option[Double]))
      .toDF("a", "b")
      .select(Relations.safeAdd(col("a"), col("b")).as("s"),
        Relations.safeSubtract(col("a"), col("b")).as("d")).collect()
    assert(r(0).getDouble(0) == 3.0 && r(0).getDouble(1) == -1.0)
    assert(r(1).getDouble(0) == 3.0 && r(1).getDouble(1) == -3.0)
    assert(r(2).isNullAt(0) && r(2).isNullAt(1))
  }

  test("rangeJoinBucketed ≡ the theta join, planned as an equi-join") {
    val rnd = new scala.util.Random(7)
    val facts = Seq.tabulate(500)(i => (i.toLong, rnd.nextDouble() * 1000 - 100))
    val ranges = Seq((1, -50.0, 100.0), (2, 80.0, 90.0),
      (3, 200.0, 1000.0), (4, 850.0, 2000.0))
    val joined = Relations.rangeJoinBucketed(
      facts.toDF("id", "v"), "v", ranges.toDF("rid", "lo", "hi"),
      "lo", "hi", 75.0)
    val got = joined.select("id", "rid").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val expected = (for {
      (id, v) <- facts; (rid, lo, hi) <- ranges if v >= lo && v < hi
    } yield (id, rid)).toSet
    assert(got == expected)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"range join must not plan as a nested loop:\n$plan")
  }

  test("rangeJoinBucketed fails fast on a range spanning too many buckets") {
    val facts = Seq((1L, 5.0)).toDF("id", "v")
    val ranges = Seq((1, 0.0, 1e9)).toDF("rid", "lo", "hi")
    val e = intercept[Exception] {
      Relations.rangeJoinBucketed(facts, "v", ranges, "lo", "hi", 1.0,
        maxBucketsPerRange = 1000).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("widen bucketWidth")), s"got: $e")
  }

  test("haversineKm matches a known great-circle distance") {
    // Paris (48.8566, 2.3522) to Berlin (52.52, 13.405) ≈ 877-878 km
    val km = Seq((48.8566, 2.3522, 52.52, 13.405)).toDF("la1", "lo1", "la2", "lo2")
      .select(Relations.haversineKm(col("la1"), col("lo1"), col("la2"), col("lo2")))
      .head.getDouble(0)
    assert(math.abs(km - 877.5) < 2.0, s"got $km")
  }

  test("canonicalizeUrl: variants collapse, clean URLs survive, NULL safe") {
    val s = spark; import s.implicits._
    val urls = Seq(
      "https://Example.COM/a/b/?utm_source=x&id=7&b=2",
      "http://example.com/a/b?b=2&id=7",
      "https://EXAMPLE.com/a/b?id=7&b=2&fbclid=zz",
      "https://example.com/a/b?id=8", // different id → different group
      "https://example.com/plain",    // no query at all
      null).toDF("u")
    val out = urls.select(Relations.canonicalizeUrl(col("u"))).as[String]
      .collect()
    assert(out(0) == "example.com/a/b?b=2&id=7")
    assert(out(1) == out(0) && out(2) == out(0), "variants must collapse")
    assert(out(3) == "example.com/a/b?id=8")
    assert(out(4) == "example.com/plain")
    assert(out(5) == null)
  }

  test("geoRadiusJoin: equals brute force; no duplicate pair rows") {
    val s = spark; import s.implicits._
    def pts(n: Int, salt: Long) = (1L to n.toLong).map { i =>
      val h1 = (i * 2654435761L + salt) % 120000001L
      val h2 = (i * 40503L * 65537L + salt) % 360000001L
      (i, h1 / 1000000.0 - 60.0, h2 / 1000000.0 - 180.0)
    }.toDF("id", "lat", "lon")
    val a = pts(120, 7)
    val b = pts(80, 13)
    val got = Relations.geoRadiusJoin(a, b, "id", "id", radiusKm = 800.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = a.as("x").join(b.as("y"),
        round(Relations.haversineKm(
          col("x.lat"), col("x.lon"), col("y.lat"), col("y.lon")), 3)
          <= 800.0)
      .filter(abs(col("x.lat")) <= 60 && abs(col("y.lat")) <= 60)
      .select(col("x.id"), col("y.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute, s"grid join must equal brute force " +
      s"(got ${got.size}, brute ${brute.size})")
    assert(got.nonEmpty, "fixture should produce at least one pair at 800 km")
    val rows = Relations.geoRadiusJoin(a, b, "id", "id", 800.0).count()
    assert(rows == got.size.toLong)
  }

  test("geoRadiusJoin: antimeridian-straddling pairs are found") {
    val s = spark; import s.implicits._
    // 0.1° apart across the ±180 seam (~11 km at lat 0); a decoy far away
    val a = Seq((1L, 0.0, 179.95), (2L, 0.0, 0.0)).toDF("id", "lat", "lon")
    val b = Seq((3L, 0.0, -179.95), (4L, 50.0, 90.0)).toDF("id", "lat", "lon")
    val pairs = Relations.geoRadiusJoin(a, b, "id", "id", radiusKm = 50.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 3L)),
      s"seam pair must be found, got $pairs")
  }

  test("geoRadiusJoin: out-of-band points dropped, plan never cartesian") {
    val s = spark; import s.implicits._
    val a = Seq((1L, 75.0, 0.0), (2L, 10.0, 10.0)).toDF("id", "lat", "lon")
    val b = Seq((3L, 75.1, 0.0), (4L, 10.1, 10.1)).toDF("id", "lat", "lon")
    val out = Relations.geoRadiusJoin(a, b, "id", "id", 100.0)
    val pairs = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((2L, 4L))) // the 75° pair is outside the band
    assert(!out.queryExecution.executedPlan.toString.contains("Cartesian"),
      "grid join must never plan a cartesian product")
  }
}
