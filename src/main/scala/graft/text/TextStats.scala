package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-corpus analysis: token counting, language-ID heuristic, quality
  * scoring, and per-(lang, source) rollups — everything a training-data
  * pipeline computes per document before filtering/sampling.
  *
  * All metrics are row-local built-in expressions (one corpus scan, no
  * shuffle except the final rollup aggregate) and arithmetic is exact-int
  * or single-division double, so results are partitioning-independent and
  * reproducible in the DuckDB oracle.
  */
object TextStats {

  /** Tiny deterministic English stopword set for the heuristics below. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to")

  def tokenCount(text: Column): Column = size(TextDedup.tokens(text))

  def distinctTokenCount(text: Column): Column =
    size(array_distinct(TextDedup.tokens(text)))

  /** Fraction of token instances that are stopwords (0 when empty). */
  def stopwordRatio(text: Column): Column = {
    val w = TextDedup.tokens(text)
    size(filter(w, t => t.isin(Stopwords: _*))) / size(w)
  }

  /** BPE-ish subword pre-tokenization: alphabetic runs, digit runs, and
    * single punctuation marks — the segmentation GPT-style BPE vocabularies
    * assume before merges, which makes its count the standard cheap proxy
    * for "LLM tokens" in corpus budgeting. The alternatives are disjoint
    * character classes, so Java regex (Spark) and RE2 (DuckDB) agree.
    */
  val SubwordPattern: String = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit(SubwordPattern), lit(0)))

  /** n-gram-free language-ID heuristic: classify as English iff the
    * stopword ratio clears a floor. (The n-gram variant below is the
    * fuller classifier; this one survives as the cheaper word-level
    * filter q30 gates.)
    */
  def langId(text: Column, floor: Double = 0.01): Column =
    when(stopwordRatio(text) >= floor, lit("en")).otherwise(lit("und"))

  /** Character-trigram English profile — the classic n-gram language-ID
    * signal (Cavnar & Trenkle's top-k profile idea reduced to a literal
    * top set both engines share verbatim, so scores are reproducible in
    * the DuckDB oracle).
    */
  val EnTrigramProfile: Seq[String] = Seq(
    "the", "he ", " th", "and", "nd ", " an", "ing", "ng ", " in", "ion",
    "on ", " of", "of ", " to", "to ", "ed ", "er ", " co", "ent", " re")

  /** Fraction of the document's character-trigram instances found in the
    * English profile — row-local, exact int/int double division (bit-equal
    * across engines). Null for texts shorter than one trigram; guard the
    * sequence bound too (Spark's sequence(1, n) DESCENDS for n < 1).
    */
  def trigramEnScore(text: Column): Column = {
    val tg = transform(sequence(lit(1), length(text) - 2),
      i => text.substr(i, lit(3)))
    when(length(text) >= 3,
      size(filter(tg, t => t.isin(EnTrigramProfile: _*))) /
        nullif(size(tg), lit(0)))
  }

  /** n-gram language-ID: English iff the trigram-profile score clears the
    * floor — the per-language-profile generalization is one map over more
    * profile columns.
    */
  def langIdNgram(text: Column, floor: Double = 0.05): Column =
    when(trigramEnScore(text) >= floor, lit("en")).otherwise(lit("und"))

  /** Per-document quality metrics: token count, lexical diversity
    * (distinct/total), stopword ratio, predicted language, and a keep flag
    * (length + diversity gates — the standard pre-training corpus filter).
    */
  def docQuality(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol),
      tokenCount(t).as("n_tokens"),
      distinctTokenCount(t).as("n_distinct_tokens"),
      (distinctTokenCount(t) / tokenCount(t)).as("lexical_diversity"),
      stopwordRatio(t).as("stopword_ratio"),
      langId(t).as("lang_pred"),
      (tokenCount(t) >= 20 && (distinctTokenCount(t) / tokenCount(t)) >= 0.2)
        .as("keep"))
  }

  /** PII redaction patterns: deliberately simple alternation-free character
    * classes so Java regex (Spark) and RE2 (DuckDB) match identically —
    * the cross-engine contract matters more than recall here; production
    * recall comes from adding patterns, not from engine-specific syntax.
    * Order matters: emails first (their local part would otherwise lose
    * digit runs to the number pass).
    */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern: String = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  val LongNumberPattern: String = "[0-9]{8,}"

  /** Redact emails, IPv4 addresses, and 8+-digit runs (phone/account/SSN
    * shaped) to typed placeholder tags — the scrubbing pass a training
    * pipeline runs before anything else sees the text. Row-local,
    * codegen'd `regexp_replace` chain; global replacement in both engines
    * (DuckDB needs the 'g' flag — see the q67 oracle).
    */
  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val noIp = regexp_replace(noEmail, Ipv4Pattern, "<IP>")
    regexp_replace(noIp, LongNumberPattern, "<NUM>")
  }

  /** Corpus-unigram log-probability scoring — the LM-flavored quality
    * signal (docs of improbable tokens are noise/garble; the cheap stand-
    * in for a real LM perplexity filter). Per doc: Σ ln(count(w)/N) over
    * its tokens, where counts come from the corpus itself.
    *
    * Determinism: a double Σ over a join is aggregation-order-dependent,
    * so each token's contribution is quantized ONCE to fixed-point
    * (`floor(ln(p)·10⁶)` as a long) and the per-doc sum is exact long
    * arithmetic — commutative, partitioning-independent, reproduced
    * exactly by DuckDB. The derived `avg_logprob` divides two exact
    * values, one IEEE op.
    *
    * Scale: token explode → count join on the token (the count side is
    * corpus-vocabulary-sized, broadcast-friendly; no hint so AQE decides)
    * → per-doc sum; all aggs map-side combinable.
    */
  /** Per-document n-gram NOVELTY — the uniqueness signal curation
    * pipelines rank by: the fraction of a doc's distinct shingles that
    * appear NOWHERE else in the corpus (document frequency 1). Template
    * text and boilerplate score near 0, original content near 1 —
    * the complement of what near-dup removal measures, useful for
    * up-weighting rare content after dedup.
    *
    * Shingles are the 64-bit hashed n-grams of
    * [[TextDedup.shingleHashedDocs]]; df equality structure matches
    * string shingles up to 64-bit collisions (the q70 caveat —
    * negligible at any corpus that fits a cluster), so the DuckDB
    * oracle replays with string shingles directly. `novelty_fp` =
    * floor(10⁶·n_novel/n_shingles) — single division, floor-quantized,
    * hash-stable.
    *
    * Scale posture: one shingle explode → map-side-combinable df count
    * → count-distinct-sized join back → per-doc agg. No windows, no
    * sorts; the df table is vocabulary-sized. Docs shorter than n
    * tokens have no shingles and drop out (novelty undefined).
    */
  def ngramNovelty(docs: DataFrame, idCol: String, textCol: String,
                   n: Int): DataFrame = {
    val sh = TextDedup.shingleHashedDocs(
      docs.filter(size(TextDedup.tokens(col(textCol))) >= n),
      idCol, textCol, n)
    val posting = sh.select(col("id").as("doc_id"), explode(col("sh")).as("s"))
    val dfc = posting.groupBy(col("s")).agg(count(lit(1)).as("__df"))
    posting.join(dfc, Seq("s"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__df") === 1, 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        floor(col("n_novel") * lit(1000000.0) / col("n_shingles"))
          .cast("long").as("novelty_fp"))
  }

  /** Curation FUNNEL — the per-stage retention report every dataset
    * card publishes: how many documents survive each cumulative filter
    * of the standard pipeline (start → exact dedup → language →
    * minimum length). Stage names are ordinal-prefixed so the report
    * sorts in pipeline order.
    *
    * Exact dedup keeps the min-id doc per content hash
    * (`md5(lower(trim(text)))` — q27's keeper convention). All four
    * counts come from ONE pass: a partition-only window flags keepers,
    * then a single aggregation evaluates every cumulative predicate —
    * no per-stage rescan, no join. At 100 TB this is one shuffle on
    * the content hash plus a map-side-combinable agg.
    */
  def curationFunnel(docs: DataFrame, idCol: String, textCol: String,
                     langCol: String, lang: String,
                     minTokens: Int): DataFrame = {
    require(minTokens >= 1, s"curationFunnel: minTokens >= 1, got $minTokens")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(lower(trim(col("__t")))))
    val flagged = docs
      .select(col(idCol).as("__id"), col(textCol).as("__t"),
        col(langCol).as("__l"))
      .withColumn("__keep", col("__id") === min(col("__id")).over(w))
    flagged.agg(
        count(lit(1)).as("n0"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("__keep") && col("__l") === lang, 1L).otherwise(0L))
          .as("n2"),
        sum(when(col("__keep") && col("__l") === lang &&
          size(TextDedup.tokens(col("__t"))) >= minTokens, 1L).otherwise(0L))
          .as("n3"))
      .select(expr(
        "stack(4, '00_start', n0, '10_exact_dedup', n1, " +
          "'20_lang', n2, '30_min_tokens', n3) AS (stage, n_docs)"))
  }

  /** Per-document token RARITY — mean inverse document frequency of the
    * doc's token occurrences: rare-vocabulary documents (technical,
    * long-tail topics) score high, stopword-heavy boilerplate low. The
    * q84 fixed-point recipe exactly: each occurrence contributes
    * floor(ln(N/df)·10⁶) (N = corpus doc count, df = docs containing
    * the token), summed as exact integer-valued doubles, divided once.
    *
    * Scale posture: token explode → distinct (doc, token) →
    * map-side-combinable df count → join back on the token (vocabulary
    * -sized side) → per-doc agg; N is the one driver-collected scalar
    * (model state, the q84 convention).
    */
  /** Hashed-linear-classifier INFERENCE — the fastText-shaped quality
    * filter (Joulin et al. 2017, "Bag of Tricks for Efficient Text
    * Classification"): features are all unigram + word-bigram
    * OCCURRENCES, hashed into `buckets` buckets, and the document score
    * is the mean of the bucket weights — the standard cheap quality
    * classifier pipelines run corpus-wide before sampling.
    *
    * The model here is a deterministic placeholder (weight_fp(b) =
    * md5₆₀("w-"||b) mod 2000001 − 10⁶, i.e. uniform in [−1, 1] at 10⁻⁶
    * resolution) so the DuckDB oracle reproduces it bit-for-bit; a real
    * deployment swaps in trained weights — the PLUMBING is the point:
    * the model is a `buckets`-row table on the broadcast side of the
    * feature join, the corpus never shuffles, and the per-doc sum is
    * one map-side-combinable aggregation of exact longs (commutative,
    * partitioning-independent — the q84 fixed-point discipline).
    *
    * Output: (doc_id, n_features, score_fp, avg_score, keep) with
    * avg_score = (score_fp/10⁶)/n_features and keep = score_fp > 0.
    */
  def hashedLinearScore(docs: DataFrame, idCol: String, textCol: String,
                        buckets: Int = 65536): DataFrame = {
    require(buckets >= 1, s"hashedLinearScore: buckets >= 1, got $buckets")
    val spark = docs.sparkSession
    val weights = broadcast(spark.range(buckets.toLong)
      .select(col("id").as("__b"),
        (pmod(TextDedup.tokenHash60(concat(lit("w-"), col("id"))),
          lit(2000001L)) - 1000000L).as("__w")))
    // Token array staged as a projected column before the bigram
    // transform references it (HOF lambdas re-evaluate unstaged
    // expressions PER ELEMENT — the shingleHashesFromTokenHashes rule).
    val feats = docs
      .select(col(idCol).as("doc_id"),
        TextDedup.tokens(col(textCol)).as("__w"))
      .select(col("doc_id"),
        explode(concat(col("__w"),
          when(size(col("__w")) >= 2,
            transform(sequence(lit(1), size(col("__w")) - 1),
              i => concat_ws(" ", element_at(col("__w"), i),
                element_at(col("__w"), i + 1))))
            .otherwise(array().cast("array<string>")))).as("__f"))
      .filter(length(col("__f")) > 0)
      .select(col("doc_id"),
        pmod(TextDedup.tokenHash60(col("__f")), lit(buckets.toLong)).as("__b"))
    feats.join(weights, Seq("__b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_features"), sum(col("__w")).as("score_fp"))
      .select(col("doc_id"), col("n_features"), col("score_fp"),
        ((col("score_fp") / lit(1000000.0)) / col("n_features"))
          .as("avg_score"),
        (col("score_fp") > 0).as("keep"))
  }

  def tokenRarity(docs: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    val nDocs = docs.count()
    require(nDocs > 0, "tokenRarity over an empty corpus")
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextDedup.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
    val dfc = toks.select(col("doc_id"), col("w")).distinct()
      .groupBy(col("w")).agg(count(lit(1)).as("__df"))
    toks.join(dfc, Seq("w"))
      .select(col("doc_id"),
        floor(log(lit(nDocs.toDouble) / col("__df").cast("double")) *
          lit(1000000.0)).as("__c"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__c")).as("rarity_fp"))
      .select(col("doc_id"), col("n_tokens"), col("rarity_fp"),
        ((col("rarity_fp") / lit(1000000.0)) / col("n_tokens"))
          .as("avg_rarity"))
  }

  def unigramLogProb(docs: DataFrame, idCol: String,
                     textCol: String): DataFrame = {
    // Tokenize ONCE: the token table feeds the total-count action, the
    // vocabulary count agg, and the scoring join — persisted so the
    // source scan + regex tokenization run once, not three times (the
    // usual per-call lifecycle: the session owner's clearCache releases
    // it).
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextDedup.tokens(col(textCol))).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val g = toks.agg(count(lit(1))).head()
    val total = g.getLong(0)
    require(total > 0, "unigramLogProb over an empty corpus")
    val counts = toks.groupBy(col("w")).agg(count(lit(1)).as("n_w"))
    toks.join(counts, Seq("w"))
      .select(col("doc_id"),
        floor(log(col("n_w").cast("double") / lit(total.toDouble)) *
          lit(1000000.0)).as("__c"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__c")).as("logprob_fp"))
      .select(col("doc_id"), col("n_tokens"), col("logprob_fp"),
        ((col("logprob_fp") / lit(1000000.0)) / col("n_tokens"))
          .as("avg_logprob"))
  }

  /** Per-document average bigram log-probability — [[unigramLogProb]]'s
    * sequence-aware sibling: an add-one-smoothed bigram language model
    * fit on the corpus itself, scoring every document by the mean log of
    * `p(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁·)+V)` over its bigram occurrences
    * (V = corpus unigram vocabulary; c(w₁·) = occurrences of w₁ as a
    * bigram prefix). Low scores flag token sequences the corpus finds
    * improbable — gibberish and boilerplate that unigram frequency
    * (q84) cannot see because it ignores order.
    *
    * Cross-engine: same `floor(log(p)·10⁶)` fixed-point contract as
    * [[unigramLogProb]] — each term quantized once, summed as exact
    * integer-valued doubles. Bigrams are built map-side from the staged
    * token array (no window, no per-doc sort); the two count tables are
    * vocabulary-sized, map-side-combinable aggs, and V is the one
    * driver-collected scalar (model state, the q84 convention).
    */
  def bigramLogProb(docs: DataFrame, idCol: String,
                    textCol: String): DataFrame = {
    // Stage the token array as a projected column: HOF lambdas re-evaluate
    // referenced EXPRESSIONS per element, so `transform` must see a bound
    // column, not a fresh split(text). PERSISTED — the staged arrays feed
    // the vocabulary action, both count aggs, and the scoring join, so
    // the corpus is scanned and tokenized exactly once per call (the
    // per-call cache lifecycle: released by the session owner's
    // clearCache).
    val staged = docs.select(col(idCol).as("doc_id"),
      TextDedup.tokens(col(textCol)).as("__w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val grams = transform(sequence(lit(1), size(col("__w")) - 1),
      i => struct(element_at(col("__w"), i).as("w1"),
        element_at(col("__w"), i + 1).as("w2")))
    // size < 2 guard BEFORE sequence(): sequence(1, 0) yields the
    // DESCENDING [1, 0], not an empty list.
    val bi = staged.select(col("doc_id"),
        explode(when(size(col("__w")) >= 2, grams)
          .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
          .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    // Vocabulary size off the SAME staged arrays (a second raw-corpus
    // scan was the operator's dominant redundant cost).
    val v = staged.select(explode(col("__w")).as("w"))
      .agg(count_distinct(col("w"))).head().getLong(0)
    require(v > 0, "bigramLogProb over an empty corpus")
    val cbi = bi.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("__nbi"))
    val cuni = bi.groupBy(col("w1")).agg(count(lit(1)).as("__nuni"))
    bi.join(cbi, Seq("w1", "w2")).join(cuni, Seq("w1"))
      .select(col("doc_id"),
        floor(log((col("__nbi").cast("double") + 1.0) /
          (col("__nuni").cast("double") + lit(v.toDouble))) *
          lit(1000000.0)).as("__c"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__c")).as("logprob_fp"))
      .select(col("doc_id"), col("n_bigrams"), col("logprob_fp"),
        ((col("logprob_fp") / lit(1000000.0)) / col("n_bigrams"))
          .as("avg_logprob"))
  }

  /** Tokenizer-coverage / OOV report — the health check run after any
    * vocabulary decision (top-k words here; the BPE path plugs its own
    * vocab in): share of token OCCURRENCES per source falling outside
    * the vocabulary. A source with a high OOV rate will tokenize into
    * byte-fallback soup and deserves re-weighting or a bigger vocab.
    *
    * One staged token pass (persisted — it feeds the vocab count and
    * the coverage join), vocabulary via TakeOrdered (freq desc, token
    * asc — deterministic ties), BROADCAST membership join, one
    * combinable rollup.
    *
    * Output: (source, n_tokens, n_oov, oov_ppm).
    */
  def oovRate(docs: DataFrame, srcCol: String, textCol: String,
              vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, s"oovRate: vocabSize >= 1, got $vocabSize")
    val toks = docs.select(col(srcCol).as("source"),
        explode(TextDedup.tokens(col(textCol))).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = toks.groupBy(col("w")).agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("w").asc).limit(vocabSize)
      .select(col("w"), lit(1).as("__in"))
    toks.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_ppm",
        expr("(n_oov * CAST(1000000 AS BIGINT)) div n_tokens"))
  }

  /** Skip-gram pair extraction — the word2vec/GloVe training-data
    * builder (Mikolov et al. 2013; public literature): for every token,
    * its neighbors within `window` positions become (center, context)
    * pairs weighted by the standard 1/distance decay. Weights are
    * build-time 2²⁰ fixed-point literals per distance (window ≤ 8, so a
    * handful of constants — the generated-LUT discipline), making every
    * aggregate weight an exact integer.
    *
    * One staged-token-array pass (the bigramLogProb idiom: HOF lambdas
    * must see a bound column), pairs built map-side from positional
    * self-zips, one map-side-combinable count agg, TakeOrdered top-k by
    * (weight desc, center, context). Emits DIRECTED pairs (center →
    * context both ways), the word2vec convention.
    *
    * Output: (center, context, n_pairs, weight_fp, rank).
    */
  def skipgramPairs(docs: DataFrame, idCol: String, textCol: String,
                    window: Int = 3, topK: Int = 100): DataFrame = {
    require(window >= 1 && window <= 8,
      s"skipgramPairs: window in [1, 8], got $window")
    require(topK >= 1, s"skipgramPairs: topK >= 1, got $topK")
    val wFp: Map[Int, Long] = (1 to window).map(d =>
      d -> math.round((1L << 20).toDouble / d)).toMap
    val staged = docs.select(TextDedup.tokens(col(textCol)).as("__w"))
    // (i, j) pairs with 1 <= |i-j| <= window, both in range, built from
    // a flat index sequence — row-local, no shuffle until the count agg.
    val pairs = staged.select(explode(when(size(col("__w")) >= 2,
        flatten(transform(sequence(lit(1), size(col("__w"))), i =>
          transform(
            sequence(greatest(i - window, lit(1)),
              least(i + window, size(col("__w")))),
            j => struct(element_at(col("__w"), i).as("center"),
              element_at(col("__w"), j).as("context"),
              abs(j - i).as("dist"))))))
        .otherwise(array().cast(
          "array<struct<center:string,context:string,dist:int>>")))
        .as("__p"))
      .filter(col("__p.dist") >= 1)
      .select(col("__p.center").as("center"),
        col("__p.context").as("context"), col("__p.dist").as("__d"))
    val wCol = (1 to window).foldRight(lit(0L): Column) { case (d, rest) =>
      when(col("__d") === d, lit(wFp(d))).otherwise(rest)
    }
    val counted = pairs
      .groupBy(col("center"), col("context"))
      .agg(count(lit(1)).as("n_pairs"), sum(wCol).as("weight_fp"))
    val wRank = org.apache.spark.sql.expressions.Window
      .orderBy(col("weight_fp").desc, col("center").asc, col("context").asc)
    counted
      .orderBy(col("weight_fp").desc, col("center").asc, col("context").asc)
      .limit(topK)
      .withColumn("rank", row_number().over(wRank).cast("int"))
  }

  /** Compression-ratio quality signal — the cheapest "is this text
    * natural language or generated sludge" detector a curation pipeline
    * runs (low ratio = highly compressible = repetitive boilerplate /
    * template spam; the Gopher/CCNet-family heuristic): per document,
    * DEFLATE the UTF-8 bytes at a fixed level and report
    * compressed/original in ppm. Row-local `mapPartitions` with one
    * reused Deflater per partition (allocation-free inner loop), no
    * shuffle.
    *
    * Determinism contract: byte-identical for a given zlib
    * implementation (level and strategy pinned) — stable within a
    * deployment, NOT an oracle-replayable cross-engine number, so this
    * operator is spec-pinned (the streaming-operator precedent), not
    * hash-gated.
    *
    * Output: (idCol, n_bytes, n_compressed, ratio_ppm).
    */
  def compressionRatio(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val deflater = new java.util.zip.Deflater(
          java.util.zip.Deflater.BEST_SPEED)
        val buf = new Array[Byte](1 << 16)
        rows.map { case (id, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          deflater.reset()
          deflater.setInput(bytes)
          deflater.finish()
          var n = 0L
          while (!deflater.finished()) n += deflater.deflate(buf)
          (id, bytes.length.toLong, n,
            if (bytes.length == 0) 0L else n * 1000000L / bytes.length)
        }
      }
      .toDF(idCol, "n_bytes", "n_compressed", "ratio_ppm")
  }

  /** Homoglyph squashing — the dedup-evasion counter: spam and
    * plagiarized text dodge exact/shingle dedup by swapping Latin
    * letters for visually-identical Cyrillic/Greek codepoints. A
    * build-time confusable map (the common Cyrillic and Greek lookalikes
    * of Latin letters, a small curated subset of the public Unicode
    * confusables data) is applied with `translate` — codegen'd,
    * row-local, and replayable verbatim by any engine with Postgres
    * `translate` semantics, so squashed-text operators stay hash-gated
    * (q227 pipes it into exact dedup and catches planted evasions).
    */
  val homoglyphFrom: String =
    // Cyrillic а е о р с х у і Ј
    "аеорсхуіЈ" +
      // Greek capitals Α Β Ε Η Ι Κ Μ Ν Ο Ρ Τ Υ Χ
      "ΑΒΕΗΙΚΜΝΟΡ" +
      "ΤΥΧ" +
      // Greek lowercase ο ι ν
      "οιν"
  val homoglyphTo: String = "aeopcxyiJABEHIKMNOPTYXoiv"

  def squashHomoglyphs(text: Column): Column =
    translate(text, homoglyphFrom, homoglyphTo)

  /** Pointwise-mutual-information collocations — the phrase-mining
    * primitive (Church & Hanks, CL 1990) behind multi-word-expression
    * extraction and tokenizer-vocabulary seeding: bigrams whose observed
    * frequency most exceeds what their parts predict. PMI =
    * log(p(xy)/(p(x)p(y))) is monotone in the integer ratio
    * c_xy·N²/(B·c_x·c_y), so the log is never taken: the operator ranks
    * by the exact 2²⁰-scaled ratio
    *   pmi_fp = ((c_xy·2²⁰·N) div (c_x·c_y))·N div B
    * computed in DECIMAL(38,0) (the cohensKappa ↔ HUGEINT mapping), with
    * the two-step floor division replayed verbatim by the oracle.
    *
    * `minCount` kills the hapax-pair noise PMI is notorious for (a pair
    * seen once between two rare words maximizes the ratio); top-k is
    * (ratio desc, x, y)-tiebroken.
    *
    * Scale posture: one pass stages token arrays (persisted — they feed
    * the bigram explode, the unigram counts and the two scalar totals);
    * bigram/unigram counts are map-side-combinable aggs; the unigram
    * table is vocabulary-sized and BROADCAST to both joins; totals are
    * driver scalars (model state, the q84 convention); the final top-k
    * is a TakeOrdered over the filtered pair table, never a global sort.
    *
    * Output: (x, y, c_xy, n_x, n_y, pmi_fp, rank), rank 1..topK.
    */
  def pmiCollocations(docs: DataFrame, idCol: String, textCol: String,
                      minCount: Long = 5, topK: Int = 50): DataFrame = {
    require(minCount >= 1, s"pmiCollocations: minCount >= 1, got $minCount")
    require(topK >= 1, s"pmiCollocations: topK >= 1, got $topK")
    val staged = docs.select(col(idCol).as("doc_id"),
      TextDedup.tokens(col(textCol)).as("__w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = staged.agg(
      sum(size(col("__w")).cast("long")),
      sum(greatest(size(col("__w")) - 1, lit(0)).cast("long"))).head()
    val (n, b) = (totals.getLong(0), totals.getLong(1))
    require(b > 0, "pmiCollocations: corpus has no bigrams")
    val grams = transform(sequence(lit(1), size(col("__w")) - 1),
      i => struct(element_at(col("__w"), i).as("w1"),
        element_at(col("__w"), i + 1).as("w2")))
    val bi = staged.select(
        explode(when(size(col("__w")) >= 2, grams)
          .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
          .as("bg"))
      .select(col("bg.w1").as("x"), col("bg.w2").as("y"))
    val uni = staged.select(explode(col("__w")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n_w"))
    val pairs = bi.groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
      .join(broadcast(uni.select(col("w").as("x"), col("n_w").as("n_x"))),
        Seq("x"))
      .join(broadcast(uni.select(col("w").as("y"), col("n_w").as("n_y"))),
        Seq("y"))
      .withColumn("pmi_fp", expr(
        s"""CAST((CAST((CAST(c_xy AS DECIMAL(38,0)) * 1048576 * $n) div
              (CAST(n_x AS DECIMAL(38,0)) * n_y) AS DECIMAL(38,0)) * $n)
            div $b AS BIGINT)"""))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("pmi_fp").desc, col("x").asc, col("y").asc)
    pairs.orderBy(col("pmi_fp").desc, col("x").asc, col("y").asc)
      .limit(topK)
      .withColumn("rank", row_number().over(w).cast("int"))
      .select(col("x"), col("y"), col("c_xy"), col("n_x"), col("n_y"),
        col("pmi_fp"), col("rank"))
  }

  /** Byte-pair-encoding merge training — the tokenizer-training core
    * (Sennrich et al., ACL 2016; public literature): start from
    * character symbols over the word-frequency table, repeatedly count
    * adjacent symbol pairs (weighted by word frequency), merge the most
    * frequent pair corpus-wide, and repeat. Returns one row per merge
    * step: (step, merge_left, merge_right, merged, pair_count) — the
    * ordered merge list IS the trained tokenizer state.
    *
    * Determinism: the winning pair is (count desc, left asc, right asc);
    * merge application is the standard greedy-left scan (overlapping
    * runs like `aaa` under an (a,a) merge collapse leftmost-first),
    * implemented as a row-local `aggregate` fold over the symbol array —
    * zero shuffles per application. The DuckDB oracle replays the SAME
    * greedy semantics with windows: a run of consecutive match positions
    * merges at odd in-run ranks (runs longer than 1 only exist when
    * left = right), which is provably the greedy-left result.
    *
    * Scale posture: the word-frequency table (vocabulary-sized, NOT
    * corpus-sized) is the only distributed state; each iteration is one
    * map-side-combinable pair-count agg + a 1-row TakeOrdered collect
    * (the merge is model state, the q84 convention) + a row-local
    * re-fold. Cost per merge ∝ vocabulary, independent of corpus row
    * count after the initial word count.
    *
    * Contract: symbols are the corpus's ASCII word characters
    * (`[A-Za-z0-9_']`-ish); a winning pair with a single-quote would
    * break neither side (column literals, not SQL interpolation), but
    * non-space-delimited scripts are out of scope (the corpus contract,
    * as in [[normalizeText]]).
    */
  def bpeTrain(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    val (merges, sym) = bpeLoop(docs, textCol, numMerges)
    sym.unpersist(blocking = false)
    import spark.implicits._
    merges
      .map { case (s, l, r, c) => (s, l, r, l + r, c) }
      .toDF("step", "merge_left", "merge_right", "merged", "pair_count")
  }

  /** The trained tokenizer APPLIED — [[bpeTrain]]'s inference half: run
    * the same merge loop, then count every surviving symbol weighted by
    * word frequency. Output (symbol, n_occurrences) IS the subword
    * vocabulary with corpus frequencies — what a tokenizer ships with
    * alongside the merge list. Same scale posture as the trainer plus
    * one vocabulary-sized explode/agg.
    */
  def bpeVocab(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val (_, sym) = bpeLoop(docs, textCol, numMerges)
    val out = sym
      .select(col("f"), explode(col("sym")).as("symbol"))
      .groupBy(col("symbol")).agg(sum(col("f")).as("n_occurrences"))
    // Materialization note: the count runs off the persisted final symbol
    // table; unpersist after the caller's action would be ideal, but the
    // table is vocabulary-sized — the same lifecycle note as the shingle
    // caches applies (session owner clears caches between pipelines).
    out
  }

  /** Per-document token counts under the TRAINED tokenizer —
    * [[bpeVocab]]'s document-grain sibling and the number that actually
    * prices a document into a training run: context-window budgeting,
    * token-budget mixing (q98) and billing all count TOKENIZER tokens,
    * which whitespace counts (q48) systematically underestimate for
    * morphology-rich or noisy text. Runs the shared merge loop, then
    * charges each word occurrence its final symbol-array length.
    *
    * Scale posture: the per-word subword lengths are a VOCABULARY-sized
    * table (broadcast-friendly build side), so the document pass is one
    * explode + broadcast join + map-side-combinable agg; the merge loop
    * cost is [[bpeTrain]]'s (per merge ∝ vocabulary, independent of
    * corpus rows). Same final-symbol-table cache lifecycle note as
    * [[bpeVocab]].
    *
    * Output: (doc_id, n_words, n_bpe_tokens) — empty-token docs carry no
    * words and drop out, the q48 convention.
    */
  def bpeTokenCounts(docs: DataFrame, idCol: String, textCol: String,
                     numMerges: Int): DataFrame = {
    val (_, sym) = bpeLoop(docs, textCol, numMerges)
    val lens = sym.select(col("w"), size(col("sym")).cast("long").as("__n"))
    docs.select(col(idCol).as("doc_id"),
        explode(TextDedup.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .join(broadcast(lens), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("__n")).as("n_bpe_tokens"))
  }

  /** Shared BPE merge loop: returns the ordered merges and the FINAL
    * persisted symbol table (w, f, sym). Callers own the unpersist.
    */
  private def bpeLoop(docs: DataFrame, textCol: String, numMerges: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    require(numMerges >= 1, s"bpeTrain: numMerges >= 1, got $numMerges")
    import org.apache.spark.storage.StorageLevel
    val words = docs
      .select(explode(TextDedup.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
    // Character split: substring in a HOF lambda over a STAGED scalar
    // column (re-evaluating a plain column per element is free; the trap
    // is computed expressions).
    var sym = words
      .withColumn("sym", expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
      .select(col("w"), col("f"), col("sym"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= numMerges && !exhausted) {
      val pairs = sym
        .select(col("f"), explode(when(size(col("sym")) >= 2, expr(
          """transform(sequence(1, size(sym) - 1),
               i -> struct(element_at(sym, i) AS l,
                           element_at(sym, i + 1) AS r))"""))
          .otherwise(expr("CAST(array() AS array<struct<l:string,r:string>>)")))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("f")).as("cnt"))
      val top = pairs.orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.nonEmpty) {
        val (l, r, cnt) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += ((step, l, r, cnt))
        val applied = sym
          .withColumn("sym", aggregate(col("sym"),
            expr("CAST(array() AS array<string>)"),
            (acc, x) => when(
              size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
              .otherwise(concat(acc, array(x)))))
          .persist(StorageLevel.MEMORY_AND_DISK)
        applied.count() // materialize before unpersisting the parent
        sym.unpersist(blocking = false)
        sym = applied
      } else {
        // No pair left anywhere (every word is a single symbol): the pair
        // table stays empty forever, so stop — running the residual steps
        // would re-aggregate the whole symbol table for nothing.
        exhausted = true
      }
      step += 1
    }
    (merges.toSeq, sym)
  }

  /** Frequency-ordered vocabulary build — the tokenizer-training
    * front-end: corpus token counts filtered to `minCount`, ids assigned
    * by (count desc, token asc) so the mapping is total-ordered and
    * reproducible. The id assignment is a global row_number — correct
    * because a VOCABULARY is bounded (minCount caps it far below corpus
    * size); the heavy part, counting, is a map-side-combinable shuffle.
    */
  def buildVocab(docs: DataFrame, textCol: String, minCount: Long): DataFrame = {
    require(minCount >= 1, s"buildVocab: minCount >= 1, got $minCount")
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(explode(TextDedup.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
    counts.withColumn("token_id",
      row_number().over(Window.orderBy(col("n").desc, col("token").asc)))
      .select(col("token_id"), col("token"), col("n"))
  }

  /** Repeated-n-gram ratio — the repetition rule from the public Gopher/
    * MassiveText filtering recipe: the fraction of a doc's n-gram
    * occurrences claimed by its single most-frequent n-gram. Template
    * spam and looping generations score high; natural text stays low.
    * Counts are over the n-gram MULTISET (no distinct), so exact integer
    * arithmetic gates the ratio; only the max COUNT is emitted (never
    * which gram), so max-ties cost nothing.
    */
  def repetitionScore(docs: DataFrame, idCol: String, textCol: String,
                      n: Int): DataFrame = {
    require(n > 0, s"repetitionScore needs positive n, got $n")
    val w = TextDedup.tokens(col(textCol))
    val grams = transform(
      sequence(lit(1), size(w) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(j => element_at(w, i + j)): _*))
    docs.select(col(idCol).as("doc_id"),
        explode(when(size(w) >= n, grams)
          .otherwise(array().cast("array<string>"))).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_grams"), max(col("c")).as("top_count"))
      .select(col("doc_id"), col("n_grams"), col("top_count"),
        (col("top_count") / col("n_grams")).as("rep_ratio"))
  }

  /** Canonical text normalization — the pass that runs BEFORE exact dedup
    * so trivially-variant copies (case, punctuation, whitespace) collapse
    * to one canonical form: lowercase, any run of non-[a-z0-9] characters
    * → one space, edges trimmed. Alternation-free character-class regex
    * (Java ∩ RE2, like the PII patterns) so both engines normalize
    * identically; ASCII-only lowering matters here because the corpus
    * contract is ASCII word streams — locale-sensitive lowering (e.g.
    * Turkish İ) is deliberately out of scope for the cross-engine gate.
    * Row-local and codegen'd; zero shuffles.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** (doc_id, norm_text, norm_hash, n_tokens) — the normalized corpus
    * plus the md5 content key exact dedup groups on downstream.
    */
  def normalizedDocs(docs: DataFrame, idCol: String,
                     textCol: String): DataFrame = {
    val norm = normalizeText(col(textCol))
    docs.select(col(idCol).as("doc_id"), norm.as("norm_text"))
      .select(col("doc_id"), col("norm_text"),
        md5(col("norm_text")).as("norm_hash"),
        when(col("norm_text") === "", lit(0))
          .otherwise(size(split(col("norm_text"), " "))).as("n_tokens"))
  }

  /** Corpus-level heavy hitters: the `k` word n-grams appearing in the
    * most documents (document frequency — each document counts a distinct
    * n-gram once), tiebroken lexicographically. The boilerplate-detection
    * signal: n-grams near the top with df ≈ corpus size are templates or
    * injected junk.
    *
    * Scale posture: the exploded distinct-shingle stream feeds a
    * map-side-combinable count; the global top-k is TakeOrdered (a
    * per-partition heap + driver merge of k rows), never a global sort
    * materialization.
    */
  def topNgrams(docs: DataFrame, textCol: String, n: Int, k: Int): DataFrame = {
    require(n > 0 && k > 0, s"topNgrams needs positive n/k, got n=$n k=$k")
    docs.select(explode(TextDedup.shingles(col(textCol), n)).as("ngram"))
      .groupBy(col("ngram")).agg(count(lit(1)).as("n_docs"))
      .orderBy(col("n_docs").desc, col("ngram").asc)
      .limit(k)
  }

  /** BM25 top-k retrieval for a literal query over the corpus — the IR
    * scoring primitive a curation pipeline uses to pull topical subsets
    * ("find the docs most about X") without an embedding model.
    *
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·|d|/avgdl)),
    * idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) (Lucene's non-negative
    * form).
    *
    * Scale posture: the exploded token stream is filtered to the query
    * terms BEFORE any shuffle (a handful of terms survive per doc); df is
    * a ≤|terms|-row table broadcast explicitly (bounded by the query, not
    * the data); per-doc aggregation is map-side combinable; the top-k is
    * TakeOrdered. Corpus-level N/avgdl are one scalar aggregate.
    *
    * Cross-engine determinism: every float expression is a fixed tree
    * over identical operands (integer tf/df/dl, one scalar division for
    * avgdl), per-doc term contributions are summed as per-term columns in
    * literal query order (never a data-ordered float fold), and the final
    * score is `round(_, 3)` to absorb libm `ln` ULP differences — the q69
    * oracle mirrors the same tree in DuckDB.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.distinct.size == queryTerms.size,
      s"query terms must be non-empty and distinct: $queryTerms")
    require(k > 0, "k must be positive")
    val base = docs.select(col(idCol).as("doc_id"),
        TextDedup.tokens(col(textCol)).as("__w"))
      .select(col("doc_id"), col("__w"), size(col("__w")).as("dl"))
    val g = base.agg(count(lit(1)), sum(col("dl"))).head()
    val n = g.getLong(0)
    require(n > 0, "bm25TopK over an empty corpus")
    val avgdl = g.getLong(1).toDouble / n
    val tf = base.select(col("doc_id"), col("dl"), explode(col("__w")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val contrib = tf.join(broadcast(dfT), Seq("term"))
      .withColumn("__c",
        log(lit(1.0) + (lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl))))
    val termCols = queryTerms.map(t =>
      sum(when(col("term") === t, col("__c"))).as(s"__c_$t"))
    contrib.groupBy(col("doc_id"))
      .agg(termCols.head, termCols.tail: _*)
      .select(col("doc_id"),
        round(queryTerms.map(t => coalesce(col(s"__c_$t"), lit(0.0)))
          .reduce(_ + _), 3).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Sliding-window token chunking: split each document into windows of
    * `chunk` tokens overlapping by `overlap` — the standard preparation
    * for embedding/context-window-bounded consumers. Start positions are
    * 1, 1+step, … while start ≤ max(1, |d| − overlap) (step = chunk −
    * overlap), so the final window is never fully contained in its
    * predecessor and short documents yield exactly one chunk.
    *
    * Row-local: one array build + one explode per document, all codegen'd
    * built-ins — chunking 100 TB is a map-only pass. Output: (doc_id,
    * chunk_idx, chunk_start [1-based], n_chunk_tokens, chunk_text).
    */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
                  chunk: Int, overlap: Int): DataFrame = {
    require(chunk > 0, s"chunk must be positive: $chunk")
    require(overlap >= 0 && overlap < chunk,
      s"overlap must be in [0, chunk): $overlap vs $chunk")
    val step = chunk - overlap
    docs.select(col(idCol).as("doc_id"), TextDedup.tokens(col(textCol)).as("__w"))
      .select(col("doc_id"), col("__w"), size(col("__w")).as("__n"))
      .select(col("doc_id"), col("__w"), col("__n"),
        explode(sequence(lit(1), greatest(lit(1), col("__n") - overlap),
          lit(step))).as("chunk_start"))
      .select(
        col("doc_id"),
        expr(s"(chunk_start - 1) div $step").as("chunk_idx"),
        col("chunk_start"),
        least(lit(chunk), col("__n") - col("chunk_start") + 1).as("n_chunk_tokens"),
        concat_ws(" ", slice(col("__w"), col("chunk_start"), lit(chunk)))
          .as("chunk_text"))
  }

  /** Content-defined chunking (the rolling-boundary CDC family of
    * LBFS/restic/borg, on token streams): a chunk boundary opens before
    * token i wherever the n-gram starting at i hashes to
    * 0 mod `divisor` — so boundaries are a pure function of LOCAL
    * content, and an insertion early in a document shifts only the
    * chunks it touches (fixed-size chunking [[chunkTokens]] re-frames
    * everything downstream, breaking chunk-hash dedup). Expected chunk
    * length ≈ `divisor` tokens.
    *
    * Fully ROW-LOCAL: boundary detection, chunk bounds, text and hash
    * are array expressions inside one map stage — zero exchanges,
    * codegen'd built-ins, the [[chunkTokens]] posture. The md5-derived
    * boundary hash and the chunk hash both use the cross-engine hash60
    * recipe, so the q153 oracle replays every boundary bit-for-bit.
    *
    * Output: (doc_id, chunk_idx [1-based], chunk_start [1-based token],
    * n_chunk_tokens, chunk_text, chunk_hash) — chunk_hash is the
    * dedup key downstream (CDC's whole point: stable under shifts).
    */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
                ngramN: Int = 3, divisor: Int = 8): DataFrame = {
    require(ngramN >= 1, s"cdcChunks ngramN must be >= 1: $ngramN")
    require(divisor >= 2, s"cdcChunks divisor must be >= 2: $divisor")
    val staged = docs
      .select(col(idCol).as("doc_id"), TextDedup.tokens(col(textCol)).as("__w"))
      .select(col("doc_id"), col("__w"), size(col("__w")).as("__t"))
    // Chunk starts: position 1 plus every boundary position in
    // [2, T-n+1] whose n-gram hash divides. The sequence() is guarded
    // (sequence(2, 0) would be DESCENDING, the bigramLogProb lesson).
    val starts = concat(
      array(lit(1)),
      when(col("__t") >= ngramN + 1,
        filter(sequence(lit(2), col("__t") - (ngramN - 1)),
          i => conv(substring(md5(
              concat_ws(" ", slice(col("__w"), i, lit(ngramN)))), 1, 15),
            16, 10).cast("long") % divisor === 0))
        .otherwise(array().cast("array<int>")))
    staged
      .select(col("doc_id"), col("__w"), col("__t"), starts.as("__s"))
      .select(col("doc_id"), col("__w"), col("__t"), col("__s"),
        posexplode(col("__s")))
      .select(col("doc_id"),
        (col("pos") + 1).as("chunk_idx"),
        col("col").as("chunk_start"),
        when(col("pos") + 2 <= size(col("__s")),
          element_at(col("__s"), (col("pos") + 2).cast("int")) - 1)
          .otherwise(col("__t")).as("__end"),
        col("__w"))
      .select(col("doc_id"), col("chunk_idx"), col("chunk_start"),
        (col("__end") - col("chunk_start") + 1).as("n_chunk_tokens"),
        concat_ws(" ", slice(col("__w"), col("chunk_start"),
          col("__end") - col("chunk_start") + 1)).as("chunk_text"))
      .withColumn("chunk_hash",
        conv(substring(md5(col("chunk_text")), 1, 15), 16, 10).cast("long"))
  }

  /** Zipf-law exponent per corpus slice — the dataset-card health check
    * (natural text runs slope ≈ −1 on the log-log rank/frequency line;
    * templated or machine-generated slices bend it): token frequencies
    * ranked per source with the unique (freq desc, token) tiebreak,
    * both axes quantized once to fixed-point ln values, and the line
    * fitted with [[graft.operators.Analytics.olsFit]]'s exact
    * decimal-sum OLS. The fp scales cancel in the slope (d ln f /
    * d ln r), so the output is directly the Zipf exponent.
    *
    * One token-count aggregation + a vocabulary-sized rank window per
    * source + the 5-partial OLS agg — nothing corpus-sized past the
    * first shuffle.
    *
    * Output: (source, n_types, slope, intercept).
    */
  def zipfSlope(docs: DataFrame, srcCol: String, textCol: String): DataFrame = {
    val tf = docs.select(col(srcCol).as("source"),
        explode(TextDedup.tokens(col(textCol))).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("f"))
    val w = Window.partitionBy(col("source")).orderBy(col("f").desc, col("w"))
    val pts = tf.withColumn("r", row_number().over(w))
      .select(col("source"),
        floor(log(col("r").cast("double")) * lit(1000000.0)).as("x_fp"),
        floor(log(col("f").cast("double")) * lit(1000000.0)).as("y_fp"))
    graft.operators.Analytics.olsFit(pts, Seq("source"), "x_fp", "y_fp")
      .withColumnRenamed("n", "n_types")
  }

  /** CDC's payoff — the corpus-level duplicate-content report over
    * [[cdcChunks]]: a chunk OCCURRENCE is duplicated when the same
    * chunk hash appeared earlier in the corpus (first occurrence by
    * (doc_id, chunk_idx) owns the content, the q97 keep-first
    * convention), and each document reports how much of its token mass
    * is duplicated. Because CDC boundaries are shift-stable, this
    * catches shared passages that fixed-size chunking misses when
    * documents frame them at different offsets.
    *
    * Output: (doc_id, n_chunks, n_dup_chunks, n_tokens, n_dup_tokens,
    * dup_token_frac_fp = n_dup_tokens·10⁶ div n_tokens — exact integer
    * arithmetic, the standing fixed-point contract).
    *
    * Scale posture: one keep-first window keyed on the chunk hash (the
    * q97 skew exposure, bounded by CDC's ~divisor-token chunks), then a
    * map-side-combinable per-doc rollup.
    */
  def cdcDedupReport(docs: DataFrame, idCol: String, textCol: String,
                     ngramN: Int = 3, divisor: Int = 8): DataFrame = {
    val w = Window.partitionBy(col("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_idx"))
    cdcChunks(docs, idCol, textCol, ngramN, divisor)
      .withColumn("__rn", row_number().over(w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__rn") > 1, 1L).otherwise(0L)).as("n_dup_chunks"),
        sum(col("n_chunk_tokens").cast("long")).as("n_tokens"),
        sum(when(col("__rn") > 1, col("n_chunk_tokens").cast("long"))
          .otherwise(0L)).as("n_dup_tokens"))
      .withColumn("dup_token_frac_fp",
        expr("(n_dup_tokens * 1000000) div n_tokens"))
  }

  /** Positional inverted index: one posting row per token OCCURRENCE —
    * (token, doc_id, pos) with pos 1-based. The materialized search
    * index shape: built once, probed by many [[phraseSearch]] queries
    * without re-scanning the corpus. In production this is written out
    * partitioned/bucketed BY TOKEN so a query's probe reads only its
    * tokens' buckets.
    */
  def positionalPostings(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        TextDedup.tokens(col(textCol)).as("__w"))
      .select(col("doc_id"), posexplode(col("__w")))
      .select(col("col").as("token"), col("doc_id"),
        (col("pos") + 1L).cast("long").as("pos"))
      .filter(length(col("token")) > 0)

  /** Exact PHRASE query over [[positionalPostings]]: a match is an
    * anchor position where token_i sits at pos+i for every phrase word —
    * the classic position-adjacency probe. One row per match (doc_id,
    * pos of the first word).
    *
    * Scale posture: each join side is the postings filtered to ONE
    * token (pushdown reaches the index scan), so the m-way join moves
    * only the phrase words' postings — never the corpus; joins are
    * equi-joins on (doc_id, pos) and the non-anchor sides are
    * df(word)-sized, broadcast-friendly. Semi joins keep the output at
    * anchor grain with no duplicate blowup on repeated words.
    */
  def phraseSearch(postings: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch: empty phrase")
    require(phrase.forall(_.nonEmpty), "phraseSearch: empty phrase word")
    val anchor = postings.filter(col("token") === phrase.head)
      .select(col("doc_id"), col("pos"))
    phrase.zipWithIndex.tail.foldLeft(anchor) { case (acc, (w, i)) =>
      val next = postings.filter(col("token") === w)
        .select(col("doc_id"), (col("pos") - i).as("pos"))
      acc.join(next, Seq("doc_id", "pos"), "left_semi")
    }
  }

  /** Per-SOURCE curation report — the domain-level view web pipelines
    * (C4, RefinedWeb) rank and prune by: document/duplicate/language
    * counts, token mass, and the duplication rate per source. Exact-dup
    * flags come from the corpus-WIDE q27 keeper window (a source's dup
    * rate counts its copies of anything, wherever the original lives),
    * then one aggregation per source.
    *
    * dup_rate_fp = floor(10⁶·n_dup/n_docs); avg_tokens is one IEEE
    * division of two exact longs — both cross-engine stable.
    *
    * Scale posture: one content-hash shuffle (the dedup window) + one
    * map-side-combinable rollup on the low-cardinality source key.
    */
  def sourceReport(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", langCol: String = "lang",
                   sourceCol: String = "source"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(lower(trim(col("__t")))))
    docs.select(col(idCol).as("__id"), col(textCol).as("__t"),
        col(langCol).as("__l"), col(sourceCol).as("source"))
      .withColumn("__keep", col("__id") === min(col("__id")).over(w))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(!col("__keep"), 1L).otherwise(0L)).as("n_dup"),
        sum(when(col("__l") === "en", 1L).otherwise(0L)).as("n_en"),
        sum(size(TextDedup.tokens(col("__t"))).cast("long"))
          .as("total_tokens"))
      .select(col("source"), col("n_docs"), col("n_dup"), col("n_en"),
        col("total_tokens"),
        floor(col("n_dup") * lit(1000000.0) / col("n_docs")).cast("long")
          .as("dup_rate_fp"),
        (col("total_tokens").cast("double") / col("n_docs")).as("avg_tokens"))
  }

  /** Corpus rollup per (lang, source): doc/token/char totals and the mean
    * document length. `safe_divide` semantics (null on zero denominator)
    * via nullif, mirroring dbt_utils.safe_divide.
    */
  def corpusStats(docs: DataFrame): DataFrame =
    docs.groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokenCount(col("text"))).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("n_chars")) / nullif(count(lit(1)), lit(0))).as("avg_chars"),
        max(col("n_chars")).as("max_chars"))
}
