package graft.graphs

import graft.SparkSpec

import scala.util.Random

class ConnectedComponentsSpec extends SparkSpec {

  /** Union-find reference: component id = min node id (union by min). */
  private def reference(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(edges: Seq[(Long, Long)], maxRounds: Int = 50): Map[Long, Long] = {
    val s = spark; import s.implicits._
    ConnectedComponents.run(edges.toDF("src", "dst"), maxRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("components match a union-find reference on random graphs") {
    for (seed <- Seq(1, 7, 23)) {
      val rnd = new Random(seed)
      val edges = Seq.fill(60)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      assert(run(edges) == reference(edges), s"seed $seed")
    }
  }

  test("a chain collapses to the min label (diameter-bound rounds)") {
    val chain = (0L until 10L).map(i => (i, i + 1))
    assert(run(chain) == (0L to 10L).map(_ -> 0L).toMap)
  }

  test("failing to converge within maxRounds fails loudly") {
    val chain = (0L until 10L).map(i => (i, i + 1))
    intercept[IllegalArgumentException](run(chain, maxRounds = 2))
  }

  test("reliable checkpoint mode matches, and demands a checkpoint dir") {
    val s = spark; import s.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    if (spark.sparkContext.getCheckpointDir.isEmpty)
      intercept[IllegalArgumentException](
        ConnectedComponents.run(edges.toDF("src", "dst"), reliable = true))
    val dir = java.nio.file.Files.createTempDirectory("cc-chk").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val out = ConnectedComponents.run(edges.toDF("src", "dst"), reliable = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("sizeHistogram: one 3-cluster and two 2-clusters") {
    val s = spark; import s.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L)).toDF("src", "dst")
    val got = ConnectedComponents.sizeHistogram(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(3L -> 1L, 2L -> 2L))
  }
}
