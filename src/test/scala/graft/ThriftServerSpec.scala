package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.DriverManager

/** HiveServer2 entry-point parity (SURVEY §3.1: thrift
  * `TCLIService.ExecuteStatement` → `SQLOperation`): Spark ships
  * `HiveThriftServer2`, the same wire protocol the reference's JDBC/
  * beeline clients speak. The smoke starts it on the suite session,
  * connects with the stock Hive JDBC driver over a real TCP socket,
  * and round-trips a query — the process-boundary story a migrating
  * deployment cares about (engine capability is identical with or
  * without the server in front). */
class ThriftServerSpec extends AnyFunSuite {

  test("HiveThriftServer2 answers a query over the Hive JDBC wire protocol") {
    val spark = LocalSpark.spark
    // cross-session-visible data: JDBC connections get their own Spark
    // session, so a GLOBAL temp view (not a session temp view) carries
    // the fixture across the connection boundary
    spark.range(5).selectExpr("id AS k", "id * 10 AS v")
      .createOrReplaceGlobalTempView("graft_thrift_smoke")

    val port = {
      val s = new java.net.ServerSocket(0)
      try s.getLocalPort finally s.close()
    }
    spark.sqlContext.setConf("hive.server2.thrift.port", port.toString)
    spark.sqlContext.setConf("hive.server2.thrift.bind.host", "localhost")
    val server = org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
      .startWithContext(spark.sqlContext)
    try {
      // wait for the listener (the server binds asynchronously)
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var up = false
      while (!up && System.nanoTime() < deadline) {
        try {
          val s = new java.net.Socket("localhost", port)
          s.close(); up = true
        } catch { case _: java.io.IOException => Thread.sleep(200) }
      }
      assert(up, s"thrift server never bound port $port")

      Class.forName("org.apache.hive.jdbc.HiveDriver")
      val conn = DriverManager.getConnection(
        s"jdbc:hive2://localhost:$port/default", "graft", "")
      try {
        val st = conn.createStatement()
        // scalar round trip
        val r1 = st.executeQuery("SELECT 19 + 23 AS x")
        assert(r1.next() && r1.getInt("x") == 42)
        // data round trip through the global temp view
        val r2 = st.executeQuery(
          "SELECT k, v FROM global_temp.graft_thrift_smoke ORDER BY k")
        val rows = Iterator.continually(r2)
          .takeWhile(_.next()).map(r => (r.getLong(1), r.getLong(2))).toList
        assert(rows == List((0L, 0L), (1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)),
          rows.toString)
      } finally conn.close()
    } finally server.stop()
  }
}
