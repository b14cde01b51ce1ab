package graft.streaming

import graft.SparkSpec
import graft.pipeline.OrderEvents
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files
import java.sql.Timestamp

/** End-to-end streaming contract (SURVEY §2.9): MemoryStream kafka-shaped
  * source → bronze append sink with checkpoint → silver dedup/parse —
  * duplicate + out-of-order replay lands the same silver table as the
  * batch path, and a restarted query resumes from the checkpoint.
  */
class BronzeIngestSpec extends SparkSpec {
  import EventFixtures._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val fixedClock = lit(ts("2024-01-01 00:00:00")).cast("timestamp")

  private def order(id: Int, amount: Double, when: String) = OrderCreated(
    orderId = s"o$id", userId = s"u${id % 3}",
    items = Seq(Item(productId = id, qty = 2, price = amount / 2),
                Item(productId = 100 + id, qty = 1, price = 0.0)),
    totalAmount = amount, eventTime = when.replace(' ', 'T'),
    eventId = s"e$id")

  test("stream → bronze → silver equals the batch path under dup + out-of-order replay") {
    val events = Seq(
      (order(1, 10.0, "2024-01-01 01:00:00"), ts("2024-01-01 01:00:01")),
      (order(2, 20.0, "2024-01-01 01:01:00"), ts("2024-01-01 01:01:01")),
      (order(3, 30.0, "2024-01-01 00:30:00"), ts("2024-01-01 01:02:00")))
    val records = kafkaRecords(events)
    // at-least-once: replay record 0 with a LATER kafka timestamp (the
    // winner), plus an out-of-order late arrival in the second batch
    val dup = records.head.copy(timestamp = ts("2024-01-01 01:05:00"))
    val late = kafkaRecords(
      Seq((order(4, 40.0, "2024-01-01 00:10:00"), ts("2024-01-01 01:06:00"))),
      baseOffset = 100L)

    val dir = Files.createTempDirectory("graft-bronze").toString
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[KafkaRecord]
    val q = BronzeIngest.start(
      BronzeIngest.bronzeProject(input.toDF(), clock = fixedClock),
      s"$dir/table", s"$dir/ckpt", Trigger.ProcessingTime(0))
    input.addData(records)
    q.processAllAvailable()
    input.addData(late :+ dup)
    q.processAllAvailable()
    q.stop()

    val bronze = spark.read.parquet(s"$dir/table")
    assert(bronze.count() == 5, "append sink keeps every delivery, dups included")

    val silver = OrderEvents.parse(bronze)
    assert(silver.count() == 4, "one row per kafka coordinate after dedup")
    // batch path over the logically-identical record set (dup collapsed
    // to its latest delivery) must produce the same silver table
    val batchBronze = BronzeIngest.bronzeProject(
      (records.tail ++ late :+ dup).toDF(), clock = fixedClock)
    val batchSilver = OrderEvents.parse(batchBronze)
    assert(silver.exceptAll(batchSilver).isEmpty && batchSilver.exceptAll(silver).isEmpty,
      "stream and batch paths disagree")
    // the replayed coordinate carries the replay's kafka_timestamp
    val winner = silver.filter(col("order_id") === "o1")
      .select(col("kafka_timestamp")).head.getTimestamp(0)
    assert(winner == ts("2024-01-01 01:05:00"))
  }

  test("restart from checkpoint resumes without reprocessing committed batches") {
    val dir = Files.createTempDirectory("graft-bronze-restart").toString
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[KafkaRecord]
    val bronze = BronzeIngest.bronzeProject(input.toDF(), clock = fixedClock)
    val q1 = BronzeIngest.start(bronze, s"$dir/table", s"$dir/ckpt", Trigger.ProcessingTime(0))
    input.addData(kafkaRecords(Seq(
      (order(1, 10.0, "2024-01-01 01:00:00"), ts("2024-01-01 01:00:01")))))
    q1.processAllAvailable()
    q1.stop()
    val q2 = BronzeIngest.start(bronze, s"$dir/table", s"$dir/ckpt", Trigger.ProcessingTime(0))
    input.addData(kafkaRecords(Seq(
      (order(2, 20.0, "2024-01-01 01:01:00"), ts("2024-01-01 01:01:01"))), baseOffset = 50L))
    q2.processAllAvailable()
    q2.stop()
    assert(spark.read.parquet(s"$dir/table").count() == 2,
      "restarted query must not re-emit batch 1")
  }

  test("default trigger is the reference's 10 s micro-batch") {
    assert(BronzeIngest.DefaultTrigger == Trigger.ProcessingTime("10 seconds"))
  }

  test("full 10-field parse keeps items array<struct> intact; item grain explodes it") {
    import spark.implicits._
    val records = kafkaRecords(Seq(
      (order(7, 14.0, "2024-01-01 02:00:00"), ts("2024-01-01 02:00:01"))))
    val silver = OrderEvents.parse(
      BronzeIngest.bronzeProject(records.toDF(), clock = fixedClock))
    val row = silver.head
    assert(row.getAs[String]("order_id") == "o7")
    assert(row.getAs[Double]("total_amount") == 14.0)
    assert(row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("items")
      .map(_.getInt(0)).toSeq == Seq(7, 107))
    assert(row.getAs[java.sql.Timestamp]("event_ts") == ts("2024-01-01 02:00:00"))
    assert(row.getAs[java.sql.Date]("event_date") == java.sql.Date.valueOf("2024-01-01"))
    val grain = OrderEvents.itemGrain(silver).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    assert(grain == Set((7, 2L, 14.0), (107, 1L, 0.0)))
  }

  test("malformed and contract-drift payloads parse permissively to nulls") {
    import spark.implicits._
    val good = kafkaRecords(Seq(
      (order(9, 9.0, "2024-01-01 03:00:00"), ts("2024-01-01 03:00:01"))))
    val bad = Seq(
      good.head.copy(offset = 900L, value = "not json at all".getBytes),
      good.head.copy(offset = 901L,
        value = """{"order_id": "o-min"}""".getBytes))
    val silver = OrderEvents.parse(
      BronzeIngest.bronzeProject((good ++ bad).toDF(), clock = fixedClock))
    assert(silver.count() == 3)
    assert(silver.filter(col("order_id") === "o-min")
      .select(col("total_amount")).head.isNullAt(0))
    assert(silver.filter(col("order_id").isNull).count() == 1)
  }

  test("source selector: every transport resolves to the pinned envelope schema") {
    import spark.implicits._
    // the pin IS the KafkaRecord encoder's shape — one contract, asserted
    assert(org.apache.spark.sql.Encoders.product[KafkaRecord].schema ==
      BronzeIngest.EnvelopeSchema)
    // memory: the caller's MemoryStream frame, schema-checked
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[KafkaRecord]
    val fromMem = BronzeIngest.source(spark,
      Map("graft.stream.source" -> "memory"), Some(mem.toDF()))
    assert(BronzeIngest.matchesEnvelope(fromMem.schema))
    // a non-envelope memory frame is rejected loudly
    intercept[IllegalArgumentException](BronzeIngest.source(spark,
      Map("graft.stream.source" -> "memory"),
      Some(Seq((1, "x")).toDF("a", "b"))))
    // files: envelope parquet dir streams back with the same schema
    val dir = Files.createTempDirectory("graft-seam").toString + "/envelope"
    kafkaRecords(Seq(
        (order(1, 10.0, "2024-01-01 01:00:00"), ts("2024-01-01 01:00:01"))))
      .toDF().write.parquet(dir)
    val fromFiles = BronzeIngest.source(spark,
      Map("graft.stream.source" -> "files", "graft.stream.path" -> dir))
    assert(fromFiles.isStreaming)
    assert(BronzeIngest.matchesEnvelope(fromFiles.schema))
    // and the bronze projection downstream is transport-independent
    // (name/type shape; nullability legitimately differs per transport)
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq
    assert(shape(BronzeIngest.bronzeProject(fromMem, clock = fixedClock)) ==
      shape(BronzeIngest.bronzeProject(fromFiles, clock = fixedClock)))
  }

  test("source selector: kafka branch is config-complete and blocked only by the missing jar") {
    // option validation fires before source resolution
    intercept[IllegalArgumentException](BronzeIngest.source(spark,
      Map("graft.stream.source" -> "kafka")))
    // with full broker config the ONLY local failure is the absent
    // spark-sql-kafka connector (the documented environment limit) —
    // not a bug in the seam. On a cluster with the jar this `load()`
    // succeeds and the selector projects the same pinned envelope.
    val ex = intercept[Exception](BronzeIngest.source(spark, Map(
      "graft.stream.source" -> "kafka",
      "kafka.bootstrap.servers" -> "broker:9092",
      "subscribe" -> "orders.events",
      "startingOffsets" -> "earliest",
      "failOnDataLoss" -> "false")))
    assert(ex.getMessage.toLowerCase.contains("kafka"), ex.getMessage)
    // unknown transports are rejected with the valid set
    intercept[IllegalArgumentException](BronzeIngest.source(spark,
      Map("graft.stream.source" -> "pulsar")))
  }
}
