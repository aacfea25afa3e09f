package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The WRITE half of the DataSource V2 extension surface — the shape a
  * platform team implements to expose a non-file system (a feature
  * store's ingest API, a metrics service, a validation gate) as a plain
  * `df.write.format(...)` sink with Spark's task-commit protocol doing
  * the distributed bookkeeping:
  *
  *  - each task's `DataWriter` counts the rows it sees and returns the
  *    count in its `WriterCommitMessage` on task commit;
  *  - the driver-side `BatchWrite.commit` aggregates the task messages
  *    and publishes (name → rows, tasks) ATOMICALLY into a process-wide
  *    registry — readers never observe a partial job;
  *  - `abort` publishes nothing: a failed task/job leaves the registry
  *    untouched (the all-or-nothing contract a real sink gets from the
  *    same two callbacks — 2PC at the job grain).
  *
  * Usage: `df.write.format("graft.sources.CountingSink")
  * .option("name", "...").mode("append").save()`; read the result with
  * `CountingSink.result("...")`. Exercised by SourceSpec: distributed
  * counting correctness, per-task message aggregation, and the abort
  * path (a poisoned row fails the job → no publish).
  */
class CountingSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // accepts whatever schema the query provides
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CountingSink.SinkTable(
      Option(properties.get("name")).getOrElse("default"),
      Option(properties.get("failOnNegativeFirstColumn")).exists(_.toBoolean),
      Option(properties.get("failFirstAttemptOfPartition")).map(_.toInt))
}

object CountingSink {
  /** (rows, tasks) per sink name — published only by a successful
    * job-level commit. */
  private val results =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Int)]()
  def result(name: String): Option[(Long, Int)] = Option(results.get(name))
  def clear(name: String): Unit = results.remove(name)

  /** Streaming commits, keyed (name, epochId). The epoch key is what
    * makes the sink EXACTLY-ONCE under retries and checkpoint restarts:
    * a replayed epoch overwrites its own slot instead of double
    * counting, so `streamTotal` is exact however many times the engine
    * re-delivers a batch (the DSv2 streaming analogue of a file sink's
    * per-batch manifest). */
  private val streamResults = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.ConcurrentHashMap[Long, (Long, Int)]]()
  /** (total rows, committed epoch count) for a streaming sink name. */
  def streamTotal(name: String): (Long, Int) = {
    val m = streamResults.get(name)
    if (m == null) (0L, 0)
    else {
      import scala.jdk.CollectionConverters._
      (m.values.asScala.map(_._1).sum, m.size)
    }
  }
  def streamEpochs(name: String): Map[Long, (Long, Int)] = {
    val m = streamResults.get(name)
    if (m == null) Map.empty
    else {
      import scala.jdk.CollectionConverters._
      m.asScala.map { case (k, v) => (k.longValue, v) }.toMap
    }
  }
  def clearStream(name: String): Unit = streamResults.remove(name)

  private case class CountMsg(rows: Long) extends WriterCommitMessage

  /** Writer-creation attempts per (sink, partition) — the witness that
    * a scheduler-level task retry actually HAPPENED in the task-retry
    * commit test (without it, a silently-not-retried run would pass
    * vacuously). Process-wide like the result registries: local-mode
    * executors share the JVM. */
  private val attempts = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicInteger]()
  def attemptCount(name: String, partitionId: Int): Int = {
    val a = attempts.get(s"$name#$partitionId")
    if (a == null) 0 else a.get()
  }
  def clearAttempts(name: String): Unit = {
    val it = attempts.keySet().iterator()
    while (it.hasNext) if (it.next().startsWith(s"$name#")) it.remove()
  }

  private[sources] class SinkTable(name: String, failNeg: Boolean,
      failFirstAttemptOf: Option[Int] = None)
      extends Table with SupportsWrite {
    override def name(): String = s"counting_sink($name)"
    override def schema(): StructType = new StructType()
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_WRITE,
        TableCapability.STREAMING_WRITE,
        TableCapability.ACCEPT_ANY_SCHEMA)

    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
      val failAtEpoch = Option(info.options.get("failAtEpoch")).map(_.toLong)
      new WriteBuilder {
        override def build(): Write = new Write {
          override def toBatch: BatchWrite = new BatchWrite {
            override def createBatchWriterFactory(
                pInfo: PhysicalWriteInfo): DataWriterFactory =
              new CountingWriterFactory(name, failNeg, failFirstAttemptOf)
            override def commit(messages: Array[WriterCommitMessage]): Unit = {
              val rows = messages.collect { case CountMsg(n) => n }.sum
              // single atomic publish — readers see the whole job or
              // nothing
              results.put(name, (rows, messages.length))
            }
            override def abort(messages: Array[WriterCommitMessage]): Unit =
              () // nothing was published; nothing to roll back
          }
          override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
            new org.apache.spark.sql.connector.write.streaming.StreamingWrite {
              override def createStreamingWriterFactory(
                  pInfo: PhysicalWriteInfo): org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
                new StreamingCountingWriterFactory(failNeg, failAtEpoch)
              override def commit(epochId: Long,
                  messages: Array[WriterCommitMessage]): Unit = {
                val rows = messages.collect { case CountMsg(n) => n }.sum
                // idempotent per epoch: a replayed batch overwrites its
                // own slot — exactly-once totals under restart
                streamResults
                  .computeIfAbsent(name, _ =>
                    new java.util.concurrent.ConcurrentHashMap[Long, (Long, Int)]())
                  .put(epochId, (rows, messages.length))
              }
              override def abort(epochId: Long,
                  messages: Array[WriterCommitMessage]): Unit =
                () // nothing published for this epoch
            }
        }
      }
    }
  }

  private final class CountingWriterFactory(name: String, failNeg: Boolean,
      failFirstAttemptOf: Option[Int])
      extends DataWriterFactory {
    override def createWriter(partitionId: Int,
        taskId: Long): DataWriter[InternalRow] = {
      // Fault injection for the task-retry commit test: the FIRST
      // attempt of the chosen partition dies before writing a row;
      // the scheduler's retry (attempt 2) succeeds. commit() must then
      // see exactly one message for this partition — a sink that
      // counted writes instead of commit messages would double-count.
      val n = attempts.computeIfAbsent(s"$name#$partitionId",
        _ => new java.util.concurrent.atomic.AtomicInteger)
        .incrementAndGet()
      if (failFirstAttemptOf.contains(partitionId) && n == 1)
        throw new IllegalStateException(
          s"injected first-attempt fault for partition $partitionId " +
            "(task-retry commit test)")
      new CountingWriter(failNeg)
    }
  }

  /** Streaming twin of [[CountingWriterFactory]]: same counting writer,
    * plus an optional fault-injection epoch (`failAtEpoch`) used by the
    * end-to-end pipeline test to force a mid-stream abort — the write of
    * that epoch throws, the streaming query dies, and a restart from the
    * checkpoint must replay it exactly once. */
  private final class StreamingCountingWriterFactory(failNeg: Boolean,
      failAtEpoch: Option[Long])
      extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long,
        epochId: Long): DataWriter[InternalRow] = {
      if (failAtEpoch.contains(epochId))
        throw new IllegalStateException(
          s"injected sink fault at epoch $epochId (pipeline abort test)")
      new CountingWriter(failNeg)
    }
  }

  private final class CountingWriter(failNeg: Boolean)
      extends DataWriter[InternalRow] {
    private var n = 0L
    override def write(record: InternalRow): Unit = {
      // optional validation hook: a sink that rejects a record
      // fails ITS task; Spark fails the job and calls abort —
      // the registry stays untouched (tested)
      if (failNeg && !record.isNullAt(0) && record.getLong(0) < 0)
        throw new IllegalArgumentException(
          s"rejected record: negative first column ${record.getLong(0)}")
      n += 1
    }
    override def commit(): WriterCommitMessage = CountMsg(n)
    override def abort(): Unit = ()
    override def close(): Unit = ()
  }
}
