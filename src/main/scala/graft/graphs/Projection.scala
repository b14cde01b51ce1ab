package graft.graphs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Bipartite projection — the "co-occurrence graph" builder every graph
  * query in this library has so far inlined (orders×items → item-item,
  * users×docs → doc-doc): project a (left, right) incidence list onto
  * the right-hand universe, weighting each (r1, r2) edge by the number
  * of left keys they share. The canonical feeder of
  * [[ConnectedComponents]] / [[PageRank]] / [[Triangles]] /
  * [[HyperBall]].
  *
  * Scale posture: one distinct + one self equi-join on the left key —
  * fan-out per left key is degree², so the Σdegree² bound decides
  * feasibility (the q70 posting-list lesson: MEASURE it before
  * projecting; a 31-token vocabulary made 448 M pairs). `maxDegree`
  * drops left keys above the cap BEFORE the join — opt-in (the q123
  * guard economics: the common case shouldn't pay for the pathological
  * one), and dropped-key counts are loud in the companion
  * [[degreeProfile]] rather than silently vanishing.
  *
  * Output: (src, dst, n_shared) with src < dst, n_shared ≥ minShared.
  */
object Projection {

  def bipartiteProject(df: DataFrame, leftCol: String, rightCol: String,
                       minShared: Long = 1,
                       maxDegree: Option[Int] = None): DataFrame = {
    require(minShared >= 1, s"bipartiteProject: minShared >= 1, got $minShared")
    val base = df.select(col(leftCol).as("__l"), col(rightCol).as("__r"))
      .filter(col("__l").isNotNull && col("__r").isNotNull)
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val side = maxDegree match {
      case Some(cap) =>
        require(cap >= 1, s"bipartiteProject: maxDegree >= 1, got $cap")
        base.join(
          base.groupBy(col("__l")).agg(count(lit(1)).as("__d"))
            .filter(col("__d") <= cap).select(col("__l")),
          Seq("__l"))
      case None => base
    }
    side.as("a").join(side.as("b"),
        col("a.__l") === col("b.__l") && col("a.__r") < col("b.__r"))
      .groupBy(col("a.__r").as("src"), col("b.__r").as("dst"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** The pre-flight check [[bipartiteProject]]'s scaladoc demands: left
    * key degree distribution plus the exact pair fan-out Σ d·(d−1)/2 the
    * projection would generate — read THIS before projecting.
    * Output is ONE row: (n_left_keys, n_incidences, max_degree,
    * total_pairs).
    */
  def degreeProfile(df: DataFrame, leftCol: String,
                    rightCol: String): DataFrame =
    df.select(col(leftCol).as("__l"), col(rightCol).as("__r"))
      .filter(col("__l").isNotNull && col("__r").isNotNull)
      .distinct()
      .groupBy(col("__l")).agg(count(lit(1)).as("__d"))
      .agg(count(lit(1)).as("n_left_keys"),
        sum(col("__d")).as("n_incidences"),
        max(col("__d")).as("max_degree"),
        sum(col("__d").cast("decimal(38,0)") * (col("__d") - 1))
          .as("__p2"))
      .select(col("n_left_keys"), col("n_incidences"), col("max_degree"),
        expr("CAST(__p2 div 2 AS BIGINT)").as("total_pairs"))
}
