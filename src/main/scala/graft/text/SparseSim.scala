package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Sparse lexical-vector similarity — the WEIGHTED side of the set-overlap
  * family in [[TextDedup]]: where Jaccard/containment treat every shared
  * shingle equally, TF-IDF cosine weights shared terms by how much signal
  * they carry, which is the classic IR notion of "about the same thing"
  * rather than "copied from each other" (Salton & Buckley 1988;
  * the ltc weighting variant). Also hosts corpus-level source-overlap
  * reporting over the same posting-list machinery.
  *
  * Reference behavior coverage: the reference's text analytics stop at
  * exact/near-duplicate detection; these operators extend the same
  * `documents` surface to topical similarity and dataset-card overlap
  * reporting (the curation shapes a training-data pipeline adds on top —
  * e.g. RefinedWeb's per-source dedup accounting).
  *
  * Scale posture (the 100 TB contract):
  *  - candidate generation is the posting-list pair join through
  *    [[graft.operators.CandidatePairs.inBucketPairDots]] — the hot-bucket
  *    triangle split bounds any single task at ~2·cap posting rows, and
  *    the dot-product agg is map-side combinable, so the pair stream
  *    collapses before its shuffle; NEVER an all-pairs cross join;
  *  - idf=0 terms (present in every document) are dropped from postings —
  *    exact (their weight is exactly 0) and load-bearing: corpus-universal
  *    terms are precisely the df² blowup terms;
  *  - `maxDf` optionally drops near-universal terms the same way
  *    boilerplate shingles are dropped in [[TextDedup.jaccardNearDupPairs]]
  *    (the resulting cosine is then a documented lower bound);
  *  - weights are fixed-point longs (floor(w·10³)): pair dots and norms
  *    are exact long sums — commutative, partition-order-independent, and
  *    bit-reproducible by the DuckDB oracle (the q72/q84 contract).
  */
object SparseSim {

  /** TF-IDF cosine-similar document pairs (doc_a < doc_b, cosine >=
    * threshold) via posting-list dot products.
    *
    * The term unit is the word n-gram OCCURRENCE multiset (default 3) —
    * the same discrimination argument as [[TextDedup]]'s shingles:
    * natural-language unigram vocabularies are small and Zipf-flat at
    * the top, so unigram posting lists degenerate to near-all-pairs on
    * templated corpora, while n-gram df falls off fast enough that
    * Σ df² (the candidate volume) stays linear-ish in corpus size.
    *
    * Weighting is the sublinear "ltc" scheme: w(d, t) =
    * (1 + ln tf(d,t)) · ln(N / df(t)), quantized ONCE to a long
    * wq = floor(w · 10³). The log-tf damping is not just standard IR
    * practice — it is the overflow-safety bound: wq ≤ (1+ln tf)·ln N·10³
    * stays < ~4·10⁵ even at tf = 10⁵, N = 10¹², so squares (~1.6·10¹¹)
    * sum safely in a long over any realistic per-doc vocabulary, where a
    * linear-tf weight's squares would overflow exactly at the corpus
    * sizes this operator is sold for.
    *
    * Output: (doc_a, doc_b, n_shared, dot, cosine) with dot the exact
    * fixed-point long and cosine = dot / (‖a‖·‖b‖) an IEEE double both
    * engines compute identically from exact long inputs.
    *
    * N (the corpus size) counts documents with at least one term and is
    * the one driver-collected scalar (model state, the q84 convention).
    */
  def tfidfCosinePairs(docs: DataFrame, idCol: String, textCol: String,
                       threshold: Double = 0.3, ngramN: Int = 3,
                       maxDf: Option[Int] = None,
                       cap: Int = 2048): DataFrame = {
    require(ngramN >= 1, s"ngramN must be >= 1, got $ngramN")
    // The term-frequency table feeds the N action, the df agg, and the
    // weighting join — persisted so the corpus scan + tokenization run
    // once per call (the usual per-call lifecycle: released by the
    // session owner's clearCache).
    val tf = docs.select(col(idCol).cast("long").as("id"),
        explode(TextDedup.shinglesAll(col(textCol), ngramN)).as("w"))
      .groupBy(col("id"), col("w")).agg(count(lit(1)).as("tf"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nDocs = tf.select(col("id")).distinct().count()
    require(nDocs > 0, "tfidfCosinePairs over an empty corpus")
    val dfT = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    // Quantize each weight exactly once; df = N terms carry weight
    // exactly 0 (floor(x·0) = 0) so dropping them changes no dot, no
    // norm, and no score — while removing the largest posting lists.
    val weighted = tf.join(dfT, Seq("w"))
      .filter(col("df") < nDocs)
      .select(col("id"), col("w"), col("df"),
        floor((lit(1.0) + log(col("tf").cast("double")))
          * log(lit(nDocs.toDouble) / col("df").cast("double"))
          * lit(1000.0)).as("__wq"))
    // Norms over ALL discriminating terms — with maxDf set, postings are
    // pruned but norms are not, making the reported cosine an exact
    // lower bound (the q70 maxDf contract).
    val norms = weighted.groupBy(col("id"))
      .agg(sum(col("__wq") * col("__wq")).as("__nq"))
    val posting = maxDf.fold(weighted) { d =>
      require(d >= 1, s"maxDf must be >= 1, got $d")
      weighted.filter(col("df") <= d)
    }
    graft.operators.CandidatePairs.inBucketPairDots(
        posting.select(col("id"), col("w").as("bk"), col("__wq").as("__w")), cap)
      .join(norms.select(col("id").as("id_a"), col("__nq").as("__na")), Seq("id_a"))
      .join(norms.select(col("id").as("id_b"), col("__nq").as("__nb")), Seq("id_b"))
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
        col("n_shared"), col("dot"),
        (col("dot").cast("double")
          / (sqrt(col("__na").cast("double")) * sqrt(col("__nb").cast("double"))))
          .as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Exact pairwise shingle-set overlap between corpus SOURCES — the
    * dataset-card number answering "how much of source A is already in
    * source B" before mixing them into a training run (the corpus-level
    * analog of per-document near-dup): for every source pair (src_a <
    * src_b) sharing at least one shingle, the exact intersection size
    * over distinct word n-grams, Jaccard, and the min-normalized overlap
    * coefficient (the asymmetric "smaller is contained" signal, as in
    * [[TextDedup.containmentPairs]]).
    *
    * Scale posture: one distinct-(source, shingle) aggregation is the
    * only corpus-sized shuffle; the pair join fans each shingle out to at
    * most |sources| posting rows — source is a catalog-sized dimension
    * (10s–100s), so per-shingle pair expansion is bounded by |sources|²/2
    * and the co-occurrence agg is map-side combinable. Output is at most
    * |sources|² rows — report-sized. String shingles (not hashes) keep
    * the oracle bit-exact.
    */
  def sourceOverlap(docs: DataFrame, srcCol: String, textCol: String,
                    shingleN: Int = 3): DataFrame = {
    // Distinct (source, shingle) feeds the per-source size agg AND both
    // sides of the pair join — persisted per call (session-owner
    // lifecycle) so the tokenize+explode+distinct runs once.
    val ss = docs.select(col(srcCol).as("source"),
        explode(TextDedup.shingles(col(textCol), shingleN)).as("sh"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sizes = ss.groupBy(col("source")).agg(count(lit(1)).as("n_sh"))
    val inter = ss.join(ss.select(col("source").as("__src_b"), col("sh")),
        Seq("sh"))
      .filter(col("source") < col("__src_b"))
      .groupBy(col("source").as("src_a"), col("__src_b").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
    inter
      .join(sizes.select(col("source").as("src_a"), col("n_sh").as("n_a")), Seq("src_a"))
      .join(sizes.select(col("source").as("src_b"), col("n_sh").as("n_b")), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_shared"), col("n_a"), col("n_b"),
        (col("n_shared") / (col("n_a") + col("n_b") - col("n_shared"))).as("jaccard"),
        (col("n_shared") / least(col("n_a"), col("n_b"))).as("overlap"))
  }

  /** 2⁶¹−1, the Mersenne prime classic minhash permutes through. */
  val MinhashPrime: Long = 2305843009213693951L

  /** Deterministic (a_j, b_j) multiply-shift coefficients over
    * [[MinhashPrime]] (splitmix64 mixing of the hash index) — computed
    * once at plan build and embedded as literals on BOTH engines, the
    * generated-LUT discipline.
    */
  def minhashCoeffs(numHashes: Int): Seq[(Long, Long)] = {
    def mix(x0: Long): Long = {
      var x = x0 + 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }
    (0 until numHashes).map { j =>
      (java.lang.Math.floorMod(mix(2L * j + 1), MinhashPrime - 1) + 1,
        java.lang.Math.floorMod(mix(2L * j + 2), MinhashPrime))
    }
  }

  /** [[sourceOverlap]]'s sketch sibling — the 100 TB path: instead of the
    * corpus-sized posting self-join, each source is summarized by an
    * H-value minhash signature (min over a_j·h+b_j mod 2⁶¹−1 of its
    * distinct shingle hashes — one map-side-combinable agg whose state is
    * |sources|·H), and pairwise agreement fraction estimates shingle-set
    * Jaccard (Broder 1997). Signatures are MERGEABLE (element-wise min),
    * so shards sketch independently and union, the HLL-register contract.
    *
    * Cross-engine: shingle base hashes are md5-derived; the H
    * permutations run in DECIMAL(38,0) mod-prime (the cohensKappa ↔
    * HUGEINT mapping) with build-time [[minhashCoeffs]] literals, so
    * every signature value — and therefore the estimate — is exact on
    * both engines (q212). Standard error ≈ √(J(1−J)/H) (~6% at H = 64,
    * J = 0.5); the estimate-vs-exact band is spec-asserted against
    * [[sourceOverlap]].
    *
    * Output: (src_a, src_b, n_agree, est_jaccard_ppm) for every source
    * pair, src_a < src_b.
    */
  def minhashSourceSimilarity(docs: DataFrame, srcCol: String,
                              textCol: String, shingleN: Int = 3,
                              numHashes: Int = 64): DataFrame = {
    require(numHashes >= 8 && numHashes <= 256,
      s"minhashSourceSimilarity: numHashes in [8, 256], got $numHashes")
    val coeffs = minhashCoeffs(numHashes)
    val ss = docs.select(col(srcCol).as("source"),
        explode(TextDedup.shingles(col(textCol), shingleN)).as("sh"))
      .distinct()
      .withColumn("__b",
        conv(substring(md5(concat(lit("mh-"), col("sh"))), 1, 15), 16, 10)
          .cast("long"))
    val minAggs = coeffs.zipWithIndex.map { case ((a, b), j) =>
      min(expr(s"CAST((CAST(__b AS DECIMAL(38,0)) * $a + $b) % " +
        s"$MinhashPrime AS BIGINT)")).as(s"__m$j")
    }
    val sig = ss.groupBy(col("source")).agg(minAggs.head, minAggs.tail: _*)
      .select(col("source"),
        array((0 until numHashes).map(j => col(s"__m$j")): _*).as("__sig"))
    // |sources|² pair grid over the MODEL-sized signature table.
    // Catalyst folds the constant key and plans a BroadcastNestedLoopJoin
    // — deliberate and bounded (|sources| is a catalog-sized dimension),
    // the Sketches one-row-broadcast precedent, never data-sized.
    val a = sig.select(lit(1).as("__k"), col("source").as("src_a"),
      col("__sig").as("__sa"))
    val b = sig.select(lit(1).as("__k"), col("source").as("src_b"),
      col("__sig").as("__sb"))
    a.join(b, Seq("__k")).filter(col("src_a") < col("src_b"))
      .withColumn("n_agree",
        aggregate(zip_with(col("__sa"), col("__sb"),
          (x, y) => when(x === y, 1L).otherwise(0L)), lit(0L), _ + _))
      .select(col("src_a"), col("src_b"), col("n_agree"),
        expr(s"(n_agree * CAST(1000000 AS BIGINT)) div $numHashes")
          .as("est_jaccard_ppm"))
  }
}
