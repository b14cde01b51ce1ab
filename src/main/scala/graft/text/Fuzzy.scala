package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.CandidatePairs

/** Edit-distance fuzzy matching via deletion-neighborhood blocking
  * (the SymSpell idea, open literature): two strings within Levenshtein
  * distance 1 ALWAYS share a member of each other's
  * {self} ∪ {one-character deletions} neighborhood —
  *   substitution at i:  both delete position i → same variant;
  *   insertion/deletion: the longer string's deletion IS the shorter —
  * so an equi-join on variants is a COMPLETE candidate generator for
  * d ≤ 1 (no missed pairs; TrianglesSpec-style completeness is asserted
  * against brute force in FuzzySpec), at ~(len+1) join rows per string
  * instead of the all-pairs cross join.
  *
  * The record-linkage / near-key-dedup primitive: customer names, SKUs,
  * URLs differing by one typo'd character collapse without an O(n²)
  * distance matrix.
  *
  * Scale posture: candidates go through [[CandidatePairs.inBucketPairs]]
  * — the same hot-bucket triangle guard as every LSH stage, so a
  * degenerate variant bucket (mass short strings sharing a deletion)
  * scales out across bounded join cells instead of one reducer. The
  * final `levenshtein` verify touches CANDIDATES only (never the corpus
  * square), and the variant column shuffled is a 64-bit hash, not the
  * string (xxhash64 collisions can only ADD candidates, which the exact
  * verify then discards — correctness is unaffected).
  */
object Fuzzy {

  /** {self} ∪ one-character-deletion variants of `s`, hashed to longs.
    * The string is a plain input column, so per-element lambda
    * re-evaluation touches no computed intermediate (the HOF trap note
    * in GraftSession applies to COMPUTED arrays).
    */
  private def deletionVariants(s: Column): Column = array_union(
    array(xxhash64(s)),
    when(length(s) > 0,
      transform(sequence(lit(1), length(s)),
        i => xxhash64(concat(s.substr(lit(1), i - 1),
          s.substr(i + 1, length(s))))))
      .otherwise(array().cast("array<bigint>")))

  /** All unordered pairs (id_a, id_b, dist) with Levenshtein distance
    * ≤ 1 between values of `strCol` (distance 0 = exact duplicates
    * included, on distinct ids). `cap` bounds per-task bucket load.
    */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
                        cap: Int = 2048): DataFrame = {
    val ids = df.select(col(idCol).as("id"), col(strCol).as("__s"))
    val bucketed = ids
      .select(col("id"), explode(deletionVariants(col("__s"))).as("bk"))
      .distinct()
    val pairs = CandidatePairs.inBucketPairs(bucketed, cap)
    pairs
      .join(ids.select(col("id").as("id_a"), col("__s").as("__sa")), "id_a")
      .join(ids.select(col("id").as("id_b"), col("__s").as("__sb")), "id_b")
      .withColumn("dist", levenshtein(col("__sa"), col("__sb")))
      .filter(col("dist") <= 1)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
