package graft.serving

import graft.SparkSpec

import java.sql.DriverManager

/** The SQL serving endpoint end-to-end: a REAL JDBC client
  * (hive-jdbc's HiveDriver, the same protocol beeline/BI tools speak)
  * connects to the in-process Thrift server and queries the registered
  * medallion views; results must equal the DataFrame-side answers.
  */
class SqlGatewaySpec extends SparkSpec {

  // PID-derived port: a fixed one could collide with a stale server or
  // another suite run on the host and flake the whole test gate
  private val port = 10900 + (ProcessHandle.current().pid() % 80L).toInt

  test("JDBC client queries the served medallion catalog end-to-end") {
    SqlGateway.registerViews(spark, sfDir)
    val server = SqlGateway.start(spark, port)
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      // HS2 binds asynchronously — retry the connect for up to ~30 s
      var conn: java.sql.Connection = null
      var attempts = 0
      while (conn == null && attempts < 60) {
        attempts += 1
        try conn = DriverManager.getConnection(
          s"jdbc:hive2://localhost:$port/default", "graft", "")
        catch { case _: Exception => Thread.sleep(500) }
      }
      assert(conn != null, s"could not connect after $attempts attempts")
      try {
        val st = conn.createStatement()
        // raw table count matches the DataFrame side
        val r1 = st.executeQuery("SELECT COUNT(*) FROM global_temp.orders")
        assert(r1.next())
        assert(r1.getLong(1) ==
          graft.sources.Tables.orders(spark, sfDir).count())
        // a served derived view: gold minute fact aggregates correctly
        val expected = graft.pipeline.Medallion
          .salesMinute(graft.sources.Tables.events(spark, sfDir))
          .agg(org.apache.spark.sql.functions.sum("paid_orders"))
          .head.getLong(0)
        val r2 = st.executeQuery(
          "SELECT CAST(SUM(paid_orders) AS BIGINT) FROM global_temp.fct_sales_minute")
        assert(r2.next())
        assert(r2.getLong(1) == expected,
          "served view disagrees with the DataFrame-side gold fact")
        // arbitrary SQL over the catalog (join + filter through Catalyst)
        val r3 = st.executeQuery(
          """SELECT COUNT(*) FROM global_temp.order_payments_enriched
             WHERE fully_paid = true""")
        assert(r3.next())
        assert(r3.getLong(1) > 0, "enriched view served no rows")
      } finally conn.close()
    } finally {
      SqlGateway.stop(server)
    }
  }
}
