package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Probabilistic record linkage — the Fellegi–Sunter model (JASA 1969),
  * the standard behind every entity-resolution system: each compared
  * field contributes log₂(m/u) evidence when it AGREES (m = P(agree |
  * same entity), u = P(agree | different entities)) and
  * log₂((1−m)/(1−u)) when it disagrees; the pair's total log-likelihood
  * ratio lands it in match / possible / non-match bands between two
  * thresholds.
  *
  * Integer-exact cross-engine: the four log weights per field are
  * computed ONCE at plan build from the caller's (m, u) and embedded as
  * 2²⁰-scaled fixed-point literals (the generated-LUT discipline —
  * no query-time libm), so scores are exact sums both engines reproduce.
  *
  * Scale posture: candidate pairs come from a BLOCKED equi-join (the
  * caller's blocking key — never all-pairs; a 100 TB run blocks on
  * sorted-neighborhood or phonetic keys upstream, see
  * [[TextDedup.sortedNeighborhoodPairs]]), deduped `idA < idB` when the
  * sides share an id universe is the caller's concern — sides here are
  * distinct tables. Everything after the join is row-local arithmetic.
  */
object Linkage {

  /** One compared field: equality of `leftCol`/`rightCol` (NULL-safe:
    * NULL never agrees) weighted by (m, u). Probabilities must satisfy
    * 0 < u < m < 1 (agreement must be evidence FOR a match).
    */
  final case class FieldSpec(name: String, leftCol: String, rightCol: String,
                             m: Double, u: Double) {
    require(0.0 < u && u < m && m < 1.0,
      s"FieldSpec $name: need 0 < u < m < 1, got m=$m u=$u")
    private def log2(x: Double): Double = math.log(x) / math.log(2.0)
    /** 2²⁰-scaled agreement weight, rounded once at build time. */
    def agreeFp: Long = math.round(log2(m / u) * (1L << 20))
    /** 2²⁰-scaled disagreement weight (negative). */
    def disagreeFp: Long = math.round(log2((1.0 - m) / (1.0 - u)) * (1L << 20))
  }

  /** Score all blocked pairs of `left` × `right` and band them.
    *
    * Output: (idA, idB, n_agree, score_fp, decision) — decision 'match'
    * when score ≥ upperFp, 'possible' in between, non-matches DROPPED
    * (at scale the non-match mass is nearly |pairs|; emitting it would
    * make the result pair-join-sized for no review value).
    */
  def fellegiSunter(left: DataFrame, right: DataFrame,
                    idA: String, idB: String, blockCol: String,
                    fields: Seq[FieldSpec],
                    lowerFp: Long, upperFp: Long): DataFrame = {
    require(fields.nonEmpty, "fellegiSunter needs at least one field")
    require(lowerFp <= upperFp,
      s"fellegiSunter: lowerFp $lowerFp must be <= upperFp $upperFp")
    val l = left.select(col(idA) +: col(blockCol).as("__blk") +:
      fields.map(f => col(f.leftCol).as(s"__l_${f.name}")): _*)
    val r = right.select(col(idB) +: col(blockCol).as("__blk") +:
      fields.map(f => col(f.rightCol).as(s"__r_${f.name}")): _*)
    val scored = l.join(r, Seq("__blk"))
      .withColumn("__score",
        fields.map { f =>
          when(col(s"__l_${f.name}") === col(s"__r_${f.name}"),
            lit(f.agreeFp)).otherwise(lit(f.disagreeFp))
        }.reduce(_ + _))
      .withColumn("__agree",
        fields.map { f =>
          when(col(s"__l_${f.name}") === col(s"__r_${f.name}"), lit(1L))
            .otherwise(lit(0L))
        }.reduce(_ + _))
    scored.filter(col("__score") >= lowerFp)
      .select(col(idA), col(idB), col("__agree").as("n_agree"),
        col("__score").as("score_fp"),
        when(col("__score") >= upperFp, lit("match"))
          .otherwise(lit("possible")).as("decision"))
  }

  /** Golden-record survivorship — what an MDM pipeline does AFTER
    * [[fellegiSunter]] + components have grouped duplicate records: per
    * cluster, each field keeps its MAJORITY value (most frequent
    * non-null, ties broken lexicographically — deterministic without a
    * record-priority column). Values survive through their STRING
    * rendering (the cross-engine profile contract; typed callers
    * re-cast); clusters where a field is entirely NULL keep NULL.
    *
    * Scale posture: one explode to (cluster, field, value) long form,
    * one map-side-combinable count, one window over the value-count
    * grain (bounded by distinct values per field per cluster — cluster
    * size, not corpus size), one pivot back.
    *
    * Output: (componentCol, fields…) — one survivor row per cluster.
    */
  def goldenRecord(records: DataFrame, componentCol: String,
                   fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "goldenRecord needs at least one field")
    val long = records.select(col(componentCol).as("__c"),
        explode(array(fields.map(f =>
          struct(lit(f).as("__f"), col(f).cast("string").as("__v"))): _*))
          .as("__e"))
      .select(col("__c"), col("__e.__f").as("__f"), col("__e.__v").as("__v"))
      .filter(col("__v").isNotNull)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__c"), col("__f"))
      .orderBy(col("__n").desc, col("__v").asc)
    val winners = long.groupBy(col("__c"), col("__f"), col("__v"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
    val aggs = fields.map(f =>
      max(when(col("__f") === f, col("__v"))).as(f))
    winners.groupBy(col("__c").as(componentCol))
      .agg(aggs.head, aggs.tail: _*)
  }
}
