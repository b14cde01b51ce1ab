package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SymSpell deletion-neighborhood fuzzy matching vs the brute-force
  * distance matrix: completeness for d ≤ 1, exact-dup handling, the
  * hot-bucket cap path, and the no-cartesian plan contract.
  */
class FuzzySpec extends SparkSpec {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def reference(rows: Seq[(Long, String)]): Set[(Long, Long, Int)] =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && lev(sa, sb) <= 1
    } yield (ia, ib, lev(sa, sb))).toSet

  private def run(rows: Seq[(Long, String)], cap: Int = 2048): Set[(Long, Long, Int)] = {
    val s = spark; import s.implicits._
    Fuzzy.editDistancePairs(rows.toDF("id", "name"), "id", "name", cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  private val corpus = Seq[(Long, String)](
    (1L, "spark"), (2L, "spank"),   // substitution
    (3L, "sparks"), (4L, "park"),   // insertion / deletion vs "spark"
    (5L, "spark"),                  // exact duplicate of 1
    (6L, "scala"), (7L, "skala"),   // substitution pair, far from spark
    (8L, "a"), (9L, "b"), (10L, ""),// tiny strings: "a"~"b" is d=1 via "" variant;
                                    // empty string within 1 of any 1-char
    (11L, "entirely-different"))

  test("matches the brute-force distance matrix exactly (completeness d ≤ 1)") {
    assert(run(corpus) == reference(corpus))
    // sanity on the fixture: dup pair at d=0, several d=1 pairs exist
    assert(reference(corpus).contains((1L, 5L, 0)))
    assert(reference(corpus).contains((1L, 2L, 1)))
    assert(reference(corpus).contains((8L, 10L, 1)))
  }

  test("hot-bucket cap path (cap = 1 forces triangle cells) changes nothing") {
    assert(run(corpus, cap = 1) == reference(corpus))
  }

  test("digit-pattern corpus (zero-padded ids) matches brute force") {
    val rows = (0 until 120).map(i => (i.toLong, f"Customer#$i%04d"))
    assert(run(rows) == reference(rows))
  }

  test("no pairs when everything is far apart") {
    assert(run(Seq((1L, "alpha"), (2L, "bravo"), (3L, "charlie"))).isEmpty)
  }

  test("plan contract: equi-join candidates, no CartesianProduct") {
    val s = spark; import s.implicits._
    val plan = Fuzzy.editDistancePairs(
        corpus.toDF("id", "name"), "id", "name")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"all-pairs join in fuzzy plan:\n$plan")
  }
}
