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
      Option(properties.get("failOnNegativeFirstColumn")).exists(_.toBoolean))
}

object CountingSink {
  /** (rows, tasks) per sink name — published only by a successful
    * job-level commit. */
  private val results =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Int)]()
  def result(name: String): Option[(Long, Int)] = Option(results.get(name))
  def clear(name: String): Unit = results.remove(name)

  private case class CountMsg(rows: Long) extends WriterCommitMessage

  private[sources] class SinkTable(name: String, failNeg: Boolean)
      extends Table with SupportsWrite {
    override def name(): String = s"counting_sink($name)"
    override def schema(): StructType = new StructType()
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_WRITE,
        TableCapability.ACCEPT_ANY_SCHEMA)

    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
      new WriteBuilder {
        override def build(): Write = new Write {
          override def toBatch: BatchWrite = new BatchWrite {
            override def createBatchWriterFactory(
                pInfo: PhysicalWriteInfo): DataWriterFactory =
              new CountingWriterFactory(failNeg)
            override def commit(messages: Array[WriterCommitMessage]): Unit = {
              val rows = messages.collect { case CountMsg(n) => n }.sum
              // single atomic publish — readers see the whole job or
              // nothing
              results.put(name, (rows, messages.length))
            }
            override def abort(messages: Array[WriterCommitMessage]): Unit =
              () // nothing was published; nothing to roll back
          }
        }
      }
  }

  private final class CountingWriterFactory(failNeg: Boolean)
      extends DataWriterFactory {
    override def createWriter(partitionId: Int,
        taskId: Long): DataWriter[InternalRow] =
      new DataWriter[InternalRow] {
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
}
