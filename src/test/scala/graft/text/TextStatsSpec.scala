package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit checks for the text operators whose main gates are the oracle
  * queries (q26/q30/q48/q49/q67/q68) — planted cases the oracle's
  * generated corpus can't exercise directly.
  */
class TextStatsSpec extends SparkSpec {

  test("redactPii scrubs emails, IPv4s and long digit runs, leaves the rest") {
    val s = spark; import s.implicits._
    val out = Seq(
      "write to john.doe+x@sub.example.org today",
      "server 192.168.100.3 answered",
      "card 1234567890123456 and acct 87654321",
      "short 1234567 stays; so does v1.2.3.x",
      "mixed a@b.io at 10.0.0.1 num 999999999")
      .toDF("text").select(TextStats.redactPii(col("text")).as("t"))
      .collect().map(_.getString(0))
    assert(out(0) == "write to <EMAIL> today")
    assert(out(1) == "server <IP> answered")
    assert(out(2) == "card <NUM> and acct <NUM>")
    assert(out(3) == "short 1234567 stays; so does v1.2.3.x")
    assert(out(4) == "mixed <EMAIL> at <IP> num <NUM>")
  }

  test("bm25TopK matches a hand-computed reference on a tiny corpus") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "spark spark data"),
      (2L, "data lake and more words here"),
      (3L, "nothing relevant at all")).toDF("doc_id", "text")
    val got = TextStats.bm25TopK(docs, "doc_id", "text", Seq("spark", "data"), 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // reference: N=3, avgdl=(3+6+4)/3; df(spark)=1, df(data)=2
    val n = 3.0; val avgdl = 13.0 / 3
    def idf(df: Double) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def c(tf: Double, df: Double, dl: Double) =
      idf(df) * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    def r3(x: Double) = BigDecimal(x).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp = Map(
      1L -> r3(c(2, 1, 3) + c(1, 2, 3)),
      2L -> r3(c(1, 2, 6)))
    assert(got.length == 2, s"doc 3 has no query term: $got")
    got.foreach { case (id, sc) => assert(sc == exp(id), s"doc $id: $sc vs ${exp(id)}") }
    assert(got.head._1 == 1L, "doc 1 (two terms, one twice, shorter) must rank first")
  }

  test("hashedLinearScore: unigram+bigram features, md5-derived weights exact") {
    val s = spark; import s.implicits._
    def md5_60(x: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
    }
    def weight(b: Long): Long = md5_60(s"w-$b") % 2000001L - 1000000L
    def bucket(f: String): Long = md5_60(f) % 65536L
    val docs = Seq((1L, "x y"), (2L, "solo")).toDF("doc_id", "text")
    val got = TextStats.hashedLinearScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    // doc 1: features x, y, "x y"; doc 2: just the unigram
    val s1 = Seq("x", "y", "x y").map(f => weight(bucket(f))).sum
    val s2 = weight(bucket("solo"))
    assert(got(1L) == ((3L, s1, s1 > 0)), s"got ${got(1L)} want (3,$s1)")
    assert(got(2L) == ((1L, s2, s2 > 0)), s"got ${got(2L)} want (1,$s2)")
  }

  test("phraseSearch: adjacency matches only, boundaries and repeats exact") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "a data table scan b"),     // match at pos 2
      (2L, "data table x scan"),       // gap → no match
      (3L, "data table scan"),         // whole doc, pos 1
      (4L, "x y data table scan"),     // at doc end, pos 3
      (5L, "table scan data"),         // wrong order
    ).toDF("doc_id", "text")
    val idx = TextStats.positionalPostings(docs, "doc_id", "text")
    val got = TextStats.phraseSearch(idx, Seq("data", "table", "scan"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (3L, 1L), (4L, 3L)), s"got $got")
    // repeated-word phrase: overlapping anchors both match
    val rep = TextStats.phraseSearch(
      TextStats.positionalPostings(Seq((9L, "x x x")).toDF("doc_id", "text"),
        "doc_id", "text"),
      Seq("x", "x"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rep == Set((9L, 1L), (9L, 2L)), s"got $rep")
  }

  test("sourceReport: corpus-wide dup flags rolled up per source") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma", "en", "web"),   // keeper
      (2L, "alpha beta gamma", "en", "web"),   // dup of 1, same source
      (3L, "alpha beta gamma", "de", "books"), // dup of 1, OTHER source
      (4L, "one two", "en", "books"),          // unique
    ).toDF("doc_id", "text", "lang", "source")
    val got = TextStats.sourceReport(docs)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toMap
    assert(got("web") == ((2L, 1L, 2L, 6L, 500000L, 3.0)), s"${got("web")}")
    assert(got("books") == ((2L, 1L, 1L, 5L, 500000L, 2.5)), s"${got("books")}")
  }

  test("buildVocab: ids by count desc then token, minCount filters") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "b a a c a b x")).toDF("doc_id", "text")
    val out = TextStats.buildVocab(docs, "text", 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq((1, "a", 3L), (2, "b", 2L)))
  }

  test("unigramLogProb: rare-token docs score lower; fixed-point sums exact") {
    val s = spark; import s.implicits._
    // corpus of 8 tokens total: "a" x4, "b" x2, "rare" x1, "other" x1
    val docs = Seq(
      (1L, "a a a a"), (2L, "b b"), (3L, "rare"), (4L, "other"))
      .toDF("doc_id", "text")
    val out = TextStats.unigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    def fp(p: Double) = math.floor(math.log(p) * 1e6).toLong
    assert(out(1) == ((4L, 4 * fp(4.0 / 8), (4 * fp(4.0 / 8) / 1e6) / 4)))
    assert(out(3)._2 == fp(1.0 / 8))
    // common-token doc scores higher (closer to 0) than rare-token doc
    assert(out(1)._3 > out(3)._3)
  }

  test("repetitionScore: looping text scores near 1, diverse text near 1/n") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam"), // 4 bigrams, all "spam spam"
      (2L, "a b c d e"),                // 4 distinct bigrams
      (3L, "x"))                        // too short: no bigrams
      .toDF("doc_id", "text")
    val out = TextStats.repetitionScore(docs, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1) == ((4L, 4L, 1.0)))
    assert(out(2) == ((4L, 1L, 0.25)))
    assert(!out.contains(3L))
  }

  test("normalizedDocs collapses case/punct/whitespace variants to one hash") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "Hello,  World! 42"),
      (2L, "hello world 42"),
      (3L, "HELLO---world...42"),
      (4L, "something else"),
      (5L, "!!!")).toDF("doc_id", "text")
    val out = TextStats.normalizedDocs(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getInt(3))))
      .toMap
    assert(out(1)._1 == "hello world 42" && out(1)._3 == 3)
    // all three variants share one canonical form and content key
    assert(Set(1L, 2L, 3L).map(out(_)._2).size == 1)
    assert(out(4)._2 != out(1)._2)
    assert(out(5) == (("", md5Hex(""), 0)))
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("topNgrams ranks by document frequency with lexicographic tiebreak") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "a b c d"),   // "a b c", "b c d"
      (2L, "a b c"),     // "a b c"
      (3L, "a b c a b c"), // distinct within doc: "a b c","b c a","c a b"
      (4L, "z z z")).toDF("doc_id", "text")
    val got = TextStats.topNgrams(docs, "text", 3, 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // "a b c" in docs 1,2,3 = 3; everything else in exactly 1 doc —
    // ties broken lexicographically ("b c a" < "b c d" < "c a b" < "z z z")
    assert(got == Seq(("a b c", 3L), ("b c a", 1L), ("b c d", 1L)))
  }

  test("chunkTokens: overlapping windows with exact boundaries and sizes") {
    val s = spark; import s.implicits._
    // 11 tokens, chunk=5, overlap=2 → step=3, starts while ≤ 11−2: 1, 4, 7
    val docs = Seq((1L, "a b c d e f g h i j k")).toDF("doc_id", "text")
    val got = TextStats.chunkTokens(docs, "doc_id", "text", 5, 2)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getInt(3), r.getString(4)))
    assert(got.toSeq == Seq(
      (0L, 1, 5, "a b c d e"),
      (1L, 4, 5, "d e f g h"),
      (2L, 7, 5, "g h i j k")))
  }

  test("chunkTokens: every token lands in some chunk; last window never redundant") {
    val s = spark; import s.implicits._
    // 10 tokens, chunk=5, overlap=2 → starts 1, 4, 7; final chunk is 4 tokens
    val docs = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val got = TextStats.chunkTokens(docs, "doc_id", "text", 5, 2)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getInt(2), r.getInt(3), r.getString(4)))
    assert(got.last == ((7, 4, "g h i j")))
    assert(got.flatMap(_._3.split(" ")).toSet == "abcdefghij".map(_.toString).toSet)
  }

  test("chunkTokens: short docs yield exactly one chunk; bad params fail loudly") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "x y")).toDF("doc_id", "text")
    val got = TextStats.chunkTokens(docs, "doc_id", "text", 5, 2).collect()
    assert(got.length == 1 && got(0).getInt(3) == 2 && got(0).getString(4) == "x y")
    intercept[IllegalArgumentException](
      TextStats.chunkTokens(docs, "doc_id", "text", 0, 0))
    intercept[IllegalArgumentException](
      TextStats.chunkTokens(docs, "doc_id", "text", 5, 5))
  }

  test("bpeTrain: the classic low/newest/widest merges, in order") {
    val s = spark; import s.implicits._
    // Sennrich's textbook corpus: es(9) then est(9, tie broken l-asc
    // against nothing) then lo(7, tie (l,o) vs (o,w) broken on left)
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, corpus)).toDF("doc_id", "text")
    val got = TextStats.bpeTrain(docs, "text", 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "l", "o", "lo", 7L)), s"got $got")
  }

  test("bpeVocab: subword frequencies after the classic merges") {
    val s = spark; import s.implicits._
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, corpus)).toDF("doc_id", "text")
    val got = TextStats.bpeVocab(docs, "text", 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // after es, est, lo: low=[lo,w]·5, lower=[lo,w,e,r]·2,
    // newest=[n,e,w,est]·6, widest=[w,i,d,est]·3
    assert(got == Map("lo" -> 7L, "w" -> 16L, "e" -> 8L, "r" -> 2L,
      "n" -> 6L, "est" -> 9L, "i" -> 3L, "d" -> 3L), s"got $got")
  }

  test("bpeTrain: greedy-left on overlapping runs; exhaustion stops early") {
    val s = spark; import s.implicits._
    // 'aaaa' x2: (a,a) appears 3x per word = 6; greedy-left collapses to
    // [aa, aa], then (aa, aa) = 2; then one symbol per word - no pairs,
    // training stops at 2 merges even though 3 were requested
    val docs = Seq((1L, "aaaa aaaa")).toDF("doc_id", "text")
    val got = TextStats.bpeTrain(docs, "text", 3)
      .collect().map(r => (r.getInt(0), r.getString(3), r.getLong(4))).toSeq
    assert(got == Seq((1, "aa", 6L), (2, "aaaa", 2L)), s"got $got")
    intercept[IllegalArgumentException](TextStats.bpeTrain(docs, "text", 0))
    // partitioning independence: merges are corpus-global
    val spread = Seq((1L, "aaaa"), (2L, "aaaa")).toDF("doc_id", "text")
      .repartition(7)
    val g2 = TextStats.bpeTrain(spread, "text", 2)
      .collect().map(r => (r.getInt(0), r.getString(3), r.getLong(4))).toSeq
    assert(g2 == got)
  }

  test("bigramLogProb: add-one model matches hand math; <2-token docs absent") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "x"))
      .toDF("doc_id", "text")
    val got = TextStats.bigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // V = |{a,b,c,x}| = 4; c(a·) = 3; c(ab) = 2, c(ac) = 1
    val ab = math.floor(math.log(3.0 / 7.0) * 1e6).toLong
    val ac = math.floor(math.log(2.0 / 7.0) * 1e6).toLong
    assert(got == Map(
      1L -> ((1L, ab, (ab / 1e6) / 1L)),
      2L -> ((1L, ab, (ab / 1e6) / 1L)),
      3L -> ((1L, ac, (ac / 1e6) / 1L))), s"got $got")
    // a higher-probability continuation scores higher
    assert(got(1L)._3 > got(3L)._3)
  }

  test("ngramNovelty: hand-computed df=1 shares; short docs drop out") {
    val s = spark; import s.implicits._
    // 2-shingles: doc1 {ab, bc}, doc2 {ab, bx}, doc3 {q} (1 token → out)
    val docs = Seq((1L, "a b c"), (2L, "a b x"), (3L, "q"))
      .toDF("doc_id", "text")
    val got = TextStats.ngramNovelty(docs, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // "a b" has df 2; "b c" and "b x" are novel
    assert(got == Map(
      1L -> ((2L, 1L, 500000L)),
      2L -> ((2L, 1L, 500000L))), s"got $got")
  }

  test("tokenRarity: mean IDF matches hand math; ubiquitous tokens score zero") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "the cat"), (2L, "the dog"), (3L, "the the"))
      .toDF("doc_id", "text")
    val got = TextStats.tokenRarity(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    // N=3; df(the)=3 → ln(1)=0; df(cat)=df(dog)=1 → ln(3)
    val ln3 = math.floor(math.log(3.0) * 1e6).toLong
    assert(got == Map(
      1L -> ((2L, ln3)), 2L -> ((2L, ln3)), 3L -> ((2L, 0L))), s"got $got")
  }

  test("curationFunnel: hand-computed cumulative survivor counts") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "one two three", "en"),  // keeper, en, 3 tokens → survives all
      (2L, "one two three", "en"),  // exact dup of 1 → dropped at dedup
      (3L, "uno dos tres", "es"),   // keeper, wrong lang
      (4L, "short", "en"))          // keeper, en, 1 token < 2
      .toDF("doc_id", "text", "lang")
    val got = TextStats.curationFunnel(docs, "doc_id", "text", "lang", "en", 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("00_start" -> 4L, "10_exact_dedup" -> 3L,
      "20_lang" -> 2L, "30_min_tokens" -> 1L), s"got $got")
  }

  test("cdcChunks: lossless reconstruction, boundary-rule completeness") {
    val docs = graft.sources.Tables.documents(spark, sfDir).limit(60)
    val chunks = TextStats.cdcChunks(docs, "doc_id", "text")
    // (1) chunks reassemble the document exactly, in chunk_idx order
    val rebuilt = chunks
      .groupBy("doc_id")
      .agg(concat_ws(" ", array_sort(collect_list(struct(col("chunk_idx"),
        col("chunk_text")))).getField("chunk_text")).as("rebuilt"))
    val mismatch = docs.select(col("doc_id"), col("text"))
      .join(rebuilt, "doc_id")
      .filter(col("text") =!= col("rebuilt")).count()
    assert(mismatch == 0)
    // (2) interior chunk starts are EXACTLY the divides-by-8 positions,
    // recomputed independently (explode positions, test each)
    val expected = docs.select(col("doc_id"), TextDedup.tokens(col("text")).as("w"))
      .select(col("doc_id"), col("w"), size(col("w")).as("t"))
      .select(col("doc_id"), col("w"), col("t"),
        explode(sequence(lit(2), greatest(lit(1), col("t") - 2))).as("i"))
      .filter(col("i") >= 2 && col("i") <= col("t") - 2)
      .filter(conv(substring(md5(concat_ws(" ",
        slice(col("w"), col("i"), lit(3)))), 1, 15), 16, 10)
        .cast("long") % 8 === 0)
      .select(col("doc_id"), col("i").as("chunk_start"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val gotStarts = chunks.filter(col("chunk_idx") >= 2)
      .select(col("doc_id"), col("chunk_start"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(gotStarts == expected,
      s"extra=${gotStarts -- expected} missing=${expected -- gotStarts}")
  }

  test("cdcChunks: chunk hashes are shift-stable past the first boundary") {
    val s2 = spark; import s2.implicits._
    // pick a real doc with at least 3 chunks, then prepend one token
    val base = graft.sources.Tables.documents(spark, sfDir)
      .orderBy("doc_id").limit(30)
    val counts = TextStats.cdcChunks(base, "doc_id", "text")
      .groupBy("doc_id").count().filter(col("count") >= 3)
      .orderBy("doc_id").limit(1).collect()
    assert(counts.nonEmpty, "fixture has no multi-chunk doc")
    val id = counts.head.getLong(0)
    val text = base.filter(col("doc_id") === id).head.getAs[String]("text")
    val both = Seq((1L, text), (2L, "SHIFTED " + text)).toDF("doc_id", "text")
    val ch = TextStats.cdcChunks(both, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(5)))
    val origHashes = ch.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    val shiftHashes = ch.filter(_._1 == 2L).map(_._3).toSet
    // every original chunk except (possibly) the first must reappear
    // verbatim in the shifted document — the CDC contract fixed-size
    // chunking cannot give
    origHashes.drop(1).foreach(h =>
      assert(shiftHashes.contains(h), s"chunk hash $h lost after shift"))
  }

  test("cdcDedupReport: identical later doc is fully duplicated; unique doc clean") {
    val s2 = spark; import s2.implicits._
    val text = graft.sources.Tables.documents(spark, sfDir)
      .orderBy("doc_id").limit(1).head.getAs[String]("text")
    val docs = Seq((1L, text), (2L, text), (3L, "totally novel content here"))
      .toDF("doc_id", "text")
    val got = TextStats.cdcDedupReport(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val (n1, d1, t1, dt1, f1) = got(1L)
    val (n2, d2, t2, dt2, f2) = got(2L)
    // doc 2's chunks are bit-identical to doc 1's (same text, same
    // boundaries) → every one is a later duplicate
    assert(n1 == n2 && t1 == t2)
    assert(d1 == 0L && dt1 == 0L && f1 == 0L)
    assert(d2 == n2 && dt2 == t2 && f2 == 1000000L)
    assert(got(3L)._2 == 0L && got(3L)._5 == 0L)
  }

  test("zipfSlope: matches the exact integer closed form on a hand corpus") {
    val s2 = spark; import s2.implicits._
    // one source, freqs: a×4, b×2, c×1 → ranks 1,2,3
    val docs = Seq((1L, "s1", "a a b c"), (2L, "s1", "a a b"))
      .toDF("doc_id", "source", "text")
    val got = TextStats.zipfSlope(docs, "source", "text").head()
    def fp(v: Double) = math.floor(math.log(v) * 1000000.0).toLong
    val pts = Seq((fp(1), fp(4)), (fp(2), fp(2)), (fp(3), fp(1)))
    val n = BigInt(3)
    val sx = pts.map(p => BigInt(p._1)).sum
    val sy = pts.map(p => BigInt(p._2)).sum
    val sxy = pts.map(p => BigInt(p._1) * BigInt(p._2)).sum
    val sxx = pts.map(p => BigInt(p._1) * BigInt(p._1)).sum
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    assert(got.getAs[String]("source") == "s1")
    assert(got.getAs[Long]("n_types") == 3L)
    assert(got.getAs[Double]("slope") == slope)
    // a halved-frequency-per-rank corpus is Zipf-ish: slope near -1
    // (3-point least squares on {4,2,1} lands at ≈ -1.23)
    assert(slope < -0.8 && slope > -1.4, s"slope=$slope")
  }

  test("bpeTokenCounts: hand-traced merge charges each word its subword count") {
    val s2 = spark; import s2.implicits._
    // word freqs: ab×3, cd×1 → the single merge is (a,b) (count 3), so
    // "ab" becomes ONE symbol and "cd" stays two.
    val docs = Seq((1L, "ab ab cd"), (2L, "ab")).toDF("doc_id", "text")
    val got = TextStats.bpeTokenCounts(docs, "doc_id", "text", numMerges = 1)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((3L, 4L)), 2L -> ((1L, 1L))), s"got $got")
    spark.catalog.clearCache()
  }

  test("bpeTokenCounts: bounded by chars, at least the word count") {
    val docs = graft.sources.Tables.documents(spark, sfDir).limit(40)
    val rows = TextStats.bpeTokenCounts(docs, "doc_id", "text", numMerges = 2)
      .join(docs.selectExpr("doc_id",
        "size(filter(split(text, ' '), w -> length(w) > 0)) AS nw",
        "length(replace(text, ' ', '')) AS nc"), Seq("doc_id"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nWords, nBpe) = (r.getLong(1), r.getLong(2))
      assert(nBpe >= nWords && nBpe <= r.getAs[Int]("nc").toLong,
        s"doc ${r.getLong(0)}: words=$nWords bpe=$nBpe chars=${r.getAs[Int]("nc")}")
      assert(nWords == r.getAs[Int]("nw").toLong)
    }
    spark.catalog.clearCache()
  }

  test("oovRate: occurrence-grain coverage against a top-k vocab") {
    val s = spark; import s.implicits._
    // vocab of size 2 = {a, b} (a:4, b:3); c and d are OOV
    val docs = Seq(("s1", "a a b c"), ("s2", "a b d d"), ("s1", "a b"))
      .toDF("source", "text")
    val got = TextStats.oovRate(docs, "source", "text", vocabSize = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("s1") == ((6L, 1L, 166666L))) // c of 6 tokens
    assert(got("s2") == ((4L, 2L, 500000L))) // d d of 4
    spark.catalog.clearCache()
  }

  test("skipgramPairs: windowed pairs with exact 1/d weights") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "a b c"), (2L, "a b")).toDF("doc_id", "text")
    val got = TextStats.skipgramPairs(docs, "doc_id", "text",
        window = 2, topK = 50)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val w1 = 1L << 20
    val w2 = math.round((1L << 20) / 2.0)
    // (a,b): dist1 twice (both docs) → 2*w1; (a,c): dist2 once; (b,a):
    // mirror of (a,b); (b,c)/(c,b): dist1; (c,a): dist2
    assert(got(("a", "b")) == ((2L, 2 * w1)))
    assert(got(("b", "a")) == ((2L, 2 * w1)))
    assert(got(("a", "c")) == ((1L, w2)))
    assert(got(("b", "c")) == ((1L, w1)))
    assert(got.size == 6)
    // rank 1 is the heaviest pair, tiebroken lexicographically
    val top = TextStats.skipgramPairs(docs, "doc_id", "text", 2, 50)
      .filter(col("rank") === 1).head()
    assert((top.getString(0), top.getString(1)) == (("a", "b")))
  }

  test("compressionRatio: repetition compresses, determinism holds") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "the same phrase " * 50),
      (2L, (1 to 200).map(i => s"w${i * 7919 % 1000}x${i * 104729 % 997}")
        .mkString(" ")),
      (3L, "")).toDF("doc_id", "text")
    val got = TextStats.compressionRatio(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // repetitive text compresses far better than varied text
    assert(got(1L)._3 < got(2L)._3 / 2,
      s"repetitive ${got(1L)._3} should be << varied ${got(2L)._3}")
    // empty doc: zlib still emits its 8-byte envelope; ratio guard -> 0
    assert(got(3L) == ((0L, 8L, 0L)))
    assert(got(1L)._1 == "the same phrase ".length * 50L)
    val again = TextStats.compressionRatio(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert((1L to 3L).forall(i => again(i) == got(i)._2), "non-deterministic")
  }

  test("squashHomoglyphs: confusables fold to Latin, clean text unchanged") {
    val s = spark; import s.implicits._
    // "spаrk" has a Cyrillic а; "Αlpha" a Greek capital alpha
    val df = Seq("spаrk", "Αlpha", "plain ascii").toDF("t")
    val out = df.select(TextStats.squashHomoglyphs(col("t"))).as[String]
      .collect()
    assert(out.toSeq == Seq("spark", "Alpha", "plain ascii"))
    assert(TextStats.homoglyphFrom.length == TextStats.homoglyphTo.length)
  }

  test("pmiCollocations: exact ratio arithmetic and min-count filter") {
    val s = spark; import s.implicits._
    // corpus: "a b" x3, "a c" x1, "c d e" x1 → N=11 tokens, B=6 bigrams
    // unigrams: a=4, b=3, c=2, d=1, e=1; bigrams: (a,b)=3 (a,c)=1 (c,d)=1 (d,e)=1
    val docs = (Seq.fill(3)("a b") ++ Seq("a c", "c d e")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = TextStats.pmiCollocations(docs, "doc_id", "text",
      minCount = 1, topK = 10).collect()
    assert(out.length == 4)
    val byPair = out.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = byPair(("a", "b"))
    assert((ab.getLong(2), ab.getLong(3), ab.getLong(4)) == ((3L, 4L, 3L)))
    // two-step floor: t1 = (3*2^20*11) div (4*3) = 2883584; pmi =
    // (t1*11) div 6 = 5286570
    assert(ab.getLong(5) == (3L * 1048576 * 11 / 12) * 11 / 6)
    // (d,e): c=1, n_d=n_e=1 → highest ratio, rank 1
    assert(byPair(("d", "e")).getInt(6) == 1)
    // minCount 2 keeps only (a,b)
    val strict = TextStats.pmiCollocations(docs, "doc_id", "text",
      minCount = 2, topK = 10).collect()
    assert(strict.length == 1 &&
      (strict(0).getString(0), strict(0).getString(1)) == (("a", "b")))
    spark.catalog.clearCache()
  }
}
