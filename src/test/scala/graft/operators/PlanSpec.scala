package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Plan-shape regressions: the properties that keep these queries viable
  * at 100 TB — predicate pushdown to the parquet scan, column pruning,
  * and whole-stage codegen on the relational hot paths.
  */
class PlanSpec extends SparkSpec {

  private def scanLine(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString
      .split("\n").filter(_.contains("FileScan")).mkString("\n")

  test("q04-shaped filter pushes to the scan; only needed columns are read") {
    val q = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(sum(col("value")))
    val scan = scanLine(q)
    assert(scan.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)]"),
      s"filter not pushed:\n$scan")
    assert(scan.contains("ReadSchema: struct<user_id:bigint,event_type:string,value:double>"),
      s"columns not pruned:\n$scan")
  }

  test("q13 pricing summary reads exactly its 5 columns") {
    val scan = scanLine(Analytics.pricingSummary(Tables.lineitem(spark, sfDir)))
    assert(!scan.contains("l_orderkey") && !scan.contains("l_shipdate"),
      s"unneeded columns read:\n$scan")
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_returnflag", "l_linestatus")
      .foreach(c => assert(scan.contains(c), s"$c missing from scan:\n$scan"))
  }

  test("q18 single-pass plan: one orders scan, one shuffle") {
    val df = Analytics.statusCustkeyDiff(Tables.orders(spark, sfDir))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.split("\n").count(_.contains("FileScan")) == 1,
      s"expected exactly one scan:\n$plan")
    assert(plan.split("\n").count(_.contains("Exchange")) == 1,
      s"expected exactly one shuffle:\n$plan")
  }

  test("Upsert.merge plan: one shuffle (union + single precedence window)") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_ts_us"), col("value"))
    val m = graft.lake.Upsert.merge(
      ev.filter(col("event_id") % 3 === 0), ev.filter(col("event_id") % 2 === 0),
      Seq("event_id"), Seq("event_ts_us", "event_id"))
    val plan = m.queryExecution.executedPlan.toString
    assert(plan.split("\n").count(_.contains("Exchange")) == 1,
      s"merge must shuffle exactly once:\n$plan")
  }

  test("q47 day scan prunes to one partition (non-empty PartitionFilters)") {
    val ev = Tables.events(spark, sfDir).select(
      col("event_id"), col("event_type"), col("value"), col("event_date"))
    graft.lake.Catalog.writePartitionedTable(
      spark, ev, "graft_q47_events", "/tmp/graft_q47/planspec", "event_date")
    val plan = graft.SparkEntry.partitionedDayScan(spark)
      .queryExecution.executedPlan.toString
    val scans = plan.split("\n").filter(_.contains("FileScan"))
    // the main (filtered) scan must carry a real partition predicate
    assert(scans.exists(s => """PartitionFilters: \[[^\]]""".r.findFirstIn(s).isDefined
        && s.contains("event_date")),
      s"no pruned scan found:\n$plan")
  }

  test("round-10 operators prune their event scans to the used columns") {
    // transitions touch (user_id, event_type, ts/event_id); value/props
    // must not be read
    val t = Analytics.eventTransitions(Tables.events(spark, sfDir))
    val tScan = scanLine(t)
    assert(!tScan.contains("props") && !tScan.contains("value:"),
      s"transitions read unused columns:\n$tScan")
    // z-scores touch (event_type, event_id, value); props must not be read
    val z = Analytics.groupZScores(
      Tables.events(spark, sfDir)
        .select(col("event_type"), col("event_id"), col("value")),
      Seq("event_type"), "value", Seq("event_id"), 2.0)
    val zScan = scanLine(z)
    assert(!zScan.contains("props") && !zScan.contains("user_id"),
      s"z-scores read unused columns:\n$zScan")
  }

  test("LM scoring tokenizes the corpus once: final plan reads the staged cache, no re-scan") {
    // bigramLogProb's vocabulary action populates the staged token cache;
    // the returned scoring plan (both count aggs + the join) must then
    // read ONLY that cache — zero file scans of the documents table.
    // Every FileScan line in the plan text sits INSIDE an
    // InMemoryRelation description (the cache's recorded build plan); a
    // scan outside one would be a real re-read. Each description carries
    // exactly one documents scan, so the counts must match — and the
    // scoring plan must actually go through the cache.
    def cacheOnlyScans(df: org.apache.spark.sql.DataFrame, what: String): Unit = {
      val plan = df.queryExecution.executedPlan.toString
      val lines = plan.split("\n")
      assert(plan.contains("InMemoryTableScan"), s"$what not cached:\n$plan")
      assert(lines.count(_.contains("FileScan")) ==
          lines.count(_.contains("InMemoryRelation")),
        s"$what re-scans the corpus outside the staged cache:\n$plan")
    }
    val docs = Tables.documents(spark, sfDir)
    cacheOnlyScans(graft.text.TextStats.bigramLogProb(docs, "doc_id", "text"),
      "bigram scoring")
    cacheOnlyScans(graft.text.TextStats.unigramLogProb(docs, "doc_id", "text"),
      "unigram scoring")
    spark.catalog.clearCache()
  }

  test("round-12 operators prune their document scans to the used columns") {
    val docs = Tables.documents(spark, sfDir)
    // tfidf pairs touch only (doc_id, text)
    val tfidf = scanLine(graft.text.SparseSim.tfidfCosinePairs(
      docs, "doc_id", "text", threshold = 0.5))
    assert(tfidf.contains("doc_id") && tfidf.contains("text"), tfidf)
    assert(!tfidf.contains("lang") && !tfidf.contains("source")
      && !tfidf.contains("n_chars"), s"documents scan over-reads:\n$tfidf")
    // dsir touches (doc_id, lang, text) but never source/n_chars
    val dsir = scanLine(graft.ml.Sampling.dsirWeights(
      docs, "doc_id", "text", col("lang") === "en"))
    assert(!dsir.contains("source") && !dsir.contains("n_chars"),
      s"dsir scan over-reads:\n$dsir")
    // CDC chunking is one map stage over (doc_id, text): zero exchanges
    val cdc = graft.text.TextStats.cdcChunks(docs, "doc_id", "text")
    val cdcPlan = cdc.queryExecution.executedPlan.toString
    assert(!cdcPlan.contains("Exchange"), s"cdcChunks shuffled:\n$cdcPlan")
    assert(!scanLine(cdc).contains("lang"), s"cdc scan over-reads:\n${scanLine(cdc)}")
    spark.catalog.clearCache()
  }

  test("second-session operators: no cartesian pairs, map-only row-local ops") {
    val docs = Tables.documents(spark, sfDir)
    // blocking/similarity family: equi-joins only, never CartesianProduct
    Seq(
      "sorted-neighbors" -> graft.text.TextDedup.sortedNeighborPairs(
        docs, "doc_id", "text"),
      "weighted-jaccard" -> graft.text.TextDedup.weightedJaccardPairs(
        docs, "doc_id", "text")
    ).foreach { case (name, df) =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name degraded to CartesianProduct:\n$plan")
    }
    // winnowing and CDC are the row-local fingerprint family: zero
    // exchanges, scans pruned to (doc_id, text)
    val win = graft.text.TextDedup.winnowFingerprints(docs, "doc_id", "text")
    val winPlan = win.queryExecution.executedPlan.toString
    assert(!winPlan.contains("Exchange"), s"winnowing shuffled:\n$winPlan")
    assert(!scanLine(win).contains("lang"),
      s"winnowing scan over-reads:\n${scanLine(win)}")
    spark.catalog.clearCache()
  }

  test("ewma/corr panel ops scan the fact table exactly once") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type").as("series"),
        expr("event_ts_us div 86400000000").as("day"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("y_fp"))
    // corrPairs pairs inside day-grouped arrays — a self-join would show
    // two FileScans (Spark does not dedupe repeated subplans)
    val corr = Analytics.corrPairs(ev, "day", "series", "y_fp")
    val corrScans = corr.queryExecution.executedPlan.toString
      .split("\n").count(_.contains("FileScan"))
    assert(corrScans == 1, s"corrPairs scans the facts $corrScans times")
    val ewma = graft.operators.Temporal.ewmaTrailing(ev, Seq("series"),
      "day", "y_fp")
    val ewmaScans = ewma.queryExecution.executedPlan.toString
      .split("\n").count(_.contains("FileScan"))
    // spine + contributions both derive from the same daily aggregate;
    // two scans of the raw facts is the honest minimum without a persist
    assert(ewmaScans <= 2, s"ewmaTrailing scans the facts $ewmaScans times")
    spark.catalog.clearCache()
  }

  test("relational hot paths run inside whole-stage codegen") {
    val df = Analytics.pricingSummary(Tables.lineitem(spark, sfDir))
    df.collect() // AQE only materializes codegen stages in the final plan
    val plan = df.queryExecution.executedPlan.toString
    // codegen stages print as WholeStageCodegen nodes or `*(n)` prefixes
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
      s"no codegen span:\n$plan")
  }
}
