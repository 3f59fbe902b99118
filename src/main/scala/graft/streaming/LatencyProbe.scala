package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.{ForeachWriter, Row}

/** Per-record end-to-end latency probe for the low-latency envelope
  * experiment (the reference's headline design goal is µs-to-low-ms
  * per-operation latency — /root/reference/README.md:8-10; its harness
  * measures write/read pairs in a single process,
  * src/tests/integration_test.rs:442-552).
  *
  * The Spark analog measured here: a map-only pipeline over the rate
  * source, latency = sink wall clock − source-stamped event time, under
  * (a) the default micro-batch trigger and (b) `Trigger.Continuous` —
  * the two ends of Spark's latency spectrum. The foreach sink is the
  * sink both triggers support.
  *
  * LOCAL-MODE INSTRUMENT: the probe records into a JVM-static queue,
  * which works because local[n] executors share the driver JVM. On a
  * real cluster the same experiment routes the latencies through a sink
  * the driver can read (kafka/files); the pipeline under test is
  * unchanged. Rows whose first column is not the rate-source timestamp
  * are a caller bug.
  */
class LatencyProbe extends ForeachWriter[Row] {
  override def open(partitionId: Long, epochId: Long): Boolean = true
  override def process(row: Row): Unit =
    LatencyProbe.record(
      System.currentTimeMillis() - row.getTimestamp(0).getTime)
  override def close(errorOrNull: Throwable): Unit = ()
}

object LatencyProbe {
  private val samples = new ConcurrentLinkedQueue[java.lang.Long]()
  private val armed = new AtomicBoolean(false)

  /** Clear prior samples and start recording (call AFTER warmup). */
  def arm(): Unit = { samples.clear(); armed.set(true) }

  def disarm(): Unit = armed.set(false)

  private[streaming] def record(ms: Long): Unit =
    if (armed.get) samples.add(ms)

  /** Sorted snapshot of recorded latencies (ms). */
  def snapshot(): Vector[Long] = {
    import scala.jdk.CollectionConverters._
    samples.asScala.map(_.longValue()).toVector.sorted
  }

  def percentile(sorted: Vector[Long], p: Double): Long =
    if (sorted.isEmpty) -1L
    else sorted(math.min(sorted.length - 1,
      math.max(0, math.ceil(p * sorted.length).toInt - 1)))
}
