package graft

import java.io.PrintWriter
import java.net.ServerSocket
import java.util.concurrent.CountDownLatch

import org.apache.spark.sql.functions._

/** Network-transport ingest: the socket source — an unbounded source
  * whose records arrive over a TCP connection rather than from files the
  * engine can list. Together with the rate source (q147, the latency
  * envelope) this closes the "non-file unbounded source" surface that a
  * production deployment would serve from a message bus (SURVEY.md §1.4
  * maps the reference's in-process MPMC ring to Kafka; no broker exists
  * in this sandbox, so TCP lines are the nearest transport the stack can
  * actually exercise end-to-end).
  *
  * The spec stands up a real ServerSocket, streams newline-delimited
  * records through Spark's socket source into a keyed aggregation, and
  * asserts exact conservation (every sent record counted once) — the
  * same conservation contract the file-stream specs pin
  * (`/root/reference/src/memory/low_latency_mpmc_ring.rs:62-135` is the
  * reference's ingest path; its consume loop drops on overflow, which
  * SURVEY.md §1.5 corrects to exactly-once accounting).
  */
class SocketStreamSpec extends SparkTestBase {

  test("socket source conserves records through a keyed aggregation") {
    val records = (0 until 200).map(i => s"k${i % 5},$i")
    val server = new ServerSocket(0) // ephemeral port
    val port = server.getLocalPort
    val accepted = new CountDownLatch(1)
    val writer = new Thread(() => {
      val sock = server.accept()
      accepted.countDown()
      val out = new PrintWriter(sock.getOutputStream, true)
      records.foreach(out.println)
      out.flush()
      // leave the connection OPEN: the socket source treats EOF as
      // stream end and stops the query; the test stops it explicitly
      // after the counts arrive.
      Thread.sleep(30000)
      sock.close()
    })
    writer.setDaemon(true)
    writer.start()
    try {
      val lines = spark.readStream
        .format("socket")
        .option("host", "localhost")
        .option("port", port.toString)
        .load()
      val counts = lines
        .select(split(col("value"), ",").getItem(0).as("k"),
          split(col("value"), ",").getItem(1).cast("long").as("v"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      val q = counts.writeStream.outputMode("complete")
        .format("memory").queryName("socket_counts").start()
      try {
        // memory-sink polling, not processAllAvailable: the source is
        // unbounded (the writer keeps the connection open), so "all
        // available" never closes — completion is defined by the data,
        // exactly like q147's bounded consumption of the rate source
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        def total(): Long = {
          val rows = spark.table("socket_counts")
            .agg(coalesce(sum("n"), lit(0L))).head()
          rows.getLong(0)
        }
        while (total() < records.size && System.nanoTime() < deadline) {
          q.processAllAvailable() // drain whatever the socket delivered
          Thread.sleep(50)
        }
        val byKey = spark.table("socket_counts").collect()
          .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
        // exact conservation: 200 records, 40 per key, and the value
        // sums match the arithmetic series each key received
        assert(byKey.values.map(_._1).sum == records.size)
        (0 until 5).foreach { k =>
          val expectSum = (0 until 200).filter(_ % 5 == k).map(_.toLong).sum
          assert(byKey(s"k$k") == ((40L, expectSum)),
            s"key k$k: got ${byKey(s"k$k")}, want (40, $expectSum)")
        }
      } finally q.stop()
    } finally server.close()
  }
}
