package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A first-class DataSource V2 batch source — the extension surface a
  * platform team uses to expose a NON-FILE system (a feature store, an
  * internal corpus service, a synthetic-data generator) as a plain
  * `spark.read.format(...)` table that Catalyst can optimize like any
  * parquet scan. This one generates a deterministic synthetic document
  * corpus (seeded per doc_id — same rows on every read, any cluster
  * size), and implements the two optimizer contracts that matter at
  * 100 TB:
  *
  *  - `SupportsPushDownFilters`: doc_id range predicates (=, <, <=, >,
  *    >=) are absorbed at PLANNING time — the id interval is narrowed
  *    before partitions are planned, so filtered reads plan fewer
  *    input partitions (the DSv2 analogue of partition pruning). The
  *    absorbed filters are reported as fully handled; anything else
  *    stays a residual for Spark to evaluate post-scan.
  *  - `SupportsPushDownRequiredColumns`: readers materialize ONLY the
  *    projected columns (text generation — the expensive part — is
  *    skipped entirely when `text` is pruned away).
  *
  * The same provider also serves MICRO-BATCH STREAMING reads
  * (`spark.readStream.format(...)`): the stream offset is the next
  * unread doc_id, each trigger admits at most `rowsPerBatch` ids, and
  * because row content is a pure function of the id, replay from any
  * committed checkpoint offset is exactly-once by construction — the
  * one-provider-both-modes shape of a production connector.
  *
  * Usage: `spark.read.format("graft.sources.SyntheticDocs")
  * .option("docs", n).option("partitions", p).load()`. Exercised by
  * SourceSpec (row determinism, pushdown partition-pruning proof,
  * pruned-schema proof, rate-limited micro-batch stream parity).
  */
class SyntheticDocs extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticDocs.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SyntheticDocs.DocsTable(
      Option(properties.get("docs")).map(_.toLong).getOrElse(1000L),
      Option(properties.get("partitions")).map(_.toInt).getOrElse(8))
}

object SyntheticDocs {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  private val langs = Array("en", "de", "fr", "es")
  private val sources = Array("web", "wiki", "books", "code", "news")
  private val vocab = Array("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima", "mike",
    "november", "oscar", "papa", "quebec", "romeo", "sierra", "tango")

  /** SplitMix64 — deterministic per-doc stream, no shared state. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def textFor(id: Long): String = {
    val n = 5 + (mix(id) >>> 4) % 26 // 5..30 words
    val sb = new StringBuilder
    var i = 0L
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(vocab(((mix(id * 1024 + i) >>> 8) % vocab.length).toInt))
      i += 1
    }
    sb.toString
  }

  /** Length of textFor(id) WITHOUT building the string: sum of the
    * word-table lengths plus separators — so projecting `n_chars` (or
    * nothing) never pays string materialization (the pruning contract
    * the reader advertises). */
  def nCharsFor(id: Long): Long = {
    val n = 5 + (mix(id) >>> 4) % 26
    var sum = n - 1 // single-space separators
    var i = 0L
    while (i < n) {
      sum += vocab(((mix(id * 1024 + i) >>> 8) % vocab.length).toInt).length
      i += 1
    }
    sum
  }

  def langFor(id: Long): String = langs(((mix(id) >>> 16) % 4).toInt)
  def sourceFor(id: Long): String = sources(((mix(id) >>> 24) % 5).toInt)

  private[sources] class DocsTable(nDocs: Long, nParts: Int)
      extends Table with SupportsRead {
    override def name(): String = s"synthetic_docs($nDocs)"
    override def schema(): StructType = SyntheticDocs.schema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.MICRO_BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new DocsScanBuilder(
        Option(options.get("docs")).map(_.toLong).getOrElse(nDocs),
        Option(options.get("partitions")).map(_.toInt).getOrElse(nParts),
        Option(options.get("rowsPerBatch")).map(_.toLong).getOrElse(0L))
  }

  private final class DocsScanBuilder(nDocs: Long, nParts: Int,
      rowsPerBatch: Long)
      extends ScanBuilder with SupportsPushDownFilters
      with SupportsPushDownRequiredColumns {
    private var lo = 0L // inclusive
    private var hi = nDocs // exclusive
    private var pushed = Array.empty[Filter]
    private var required = SyntheticDocs.schema

    override def pushFilters(filters: Array[Filter]): Array[Filter] = {
      // literals may arrive as any boxed integral type
      val (absorbed, residual) = filters.partition {
        case GreaterThanOrEqual("doc_id", v: Number) =>
          lo = math.max(lo, v.longValue); true
        case GreaterThan("doc_id", v: Number) =>
          lo = math.max(lo, v.longValue + 1); true
        case LessThan("doc_id", v: Number) =>
          hi = math.min(hi, v.longValue); true
        case LessThanOrEqual("doc_id", v: Number) =>
          hi = math.min(hi, v.longValue + 1); true
        case EqualTo("doc_id", v: Number) =>
          lo = math.max(lo, v.longValue); hi = math.min(hi, v.longValue + 1); true
        case _ => false
      }
      pushed = absorbed
      residual
    }
    override def pushedFilters(): Array[Filter] = pushed

    override def pruneColumns(requiredSchema: StructType): Unit =
      required = requiredSchema

    override def build(): Scan =
      new DocsScan(lo, hi, nParts, required, rowsPerBatch)
  }

  private final class DocsScan(lo: Long, hi: Long, nParts: Int,
      required: StructType, rowsPerBatch: Long) extends Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this

    /** Micro-batch STREAMING read over the same id space — the offset
      * is simply the next unread doc_id, serialized as its decimal
      * string; each trigger admits at most `rowsPerBatch` ids (0 = all
      * available), so the stream replays deterministically from any
      * committed checkpoint offset (exactly-once by construction: the
      * rows of [start, end) depend on nothing but the ids). */
    override def toMicroBatchStream(
        checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
      new DocsMicroBatch(lo, hi, nParts, required,
        if (rowsPerBatch <= 0) hi - lo else rowsPerBatch)
    override def description(): String =
      s"SyntheticDocs[$lo,$hi) cols=${required.fieldNames.mkString(",")}"

    override def planInputPartitions(): Array[InputPartition] = {
      val span = math.max(0L, hi - lo)
      if (span == 0L) return Array.empty
      // fewer ids than partitions → one partition per id (pruned reads
      // plan fewer tasks — the point of planning-time pushdown)
      val parts = math.min(nParts.toLong, span).toInt
      Array.tabulate(parts) { i =>
        val a = lo + span * i / parts
        val b = lo + span * (i + 1) / parts
        DocsPartition(a, b): InputPartition
      }
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new DocsReaderFactory(required)
  }

  private case class DocsPartition(lo: Long, hi: Long) extends InputPartition

  private final class DocsMicroBatch(lo: Long, hi: Long, nParts: Int,
      required: StructType, rowsPerBatch: Long)
      extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
      with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
    import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}
    case class DocOffset(v: Long) extends Offset {
      override def json(): String = v.toString
    }
    override def initialOffset(): Offset = DocOffset(lo)
    // Admission control is STATELESS: the engine hands in the batch's
    // actual start offset (from the offset log on a checkpoint restart),
    // and the end is computed from it — never from driver-local state.
    // A mutable `admitted` watermark re-initialized on restart regressed
    // the offset log and re-emitted already-delivered ids, because the
    // engine plans the next batch BEFORE replaying commit() for the last
    // committed one (the RatePerMicroBatchStream pattern fixes exactly
    // this). Exercised by SourceSpec's stop/restart no-duplicates test.
    override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
    override def latestOffset(start: Offset, limit: ReadLimit): Offset =
      DocOffset(math.min(hi, start.asInstanceOf[DocOffset].v + rowsPerBatch))
    override def latestOffset(): Offset =
      throw new UnsupportedOperationException(
        "latestOffset(Offset, ReadLimit) should be called instead of this")
    override def reportLatestOffset(): Offset = DocOffset(hi)
    override def deserializeOffset(json: String): Offset =
      DocOffset(json.toLong)
    override def planInputPartitions(start: Offset,
        end: Offset): Array[InputPartition] = {
      val a = start.asInstanceOf[DocOffset].v
      val b = end.asInstanceOf[DocOffset].v
      val span = math.max(0L, b - a)
      if (span == 0L) return Array.empty
      val parts = math.min(nParts.toLong, span).toInt
      Array.tabulate(parts) { i =>
        DocsPartition(a + span * i / parts,
          a + span * (i + 1) / parts): InputPartition
      }
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new DocsReaderFactory(required)
    override def commit(end: Offset): Unit = ()
    override def stop(): Unit = ()
  }

  private final class DocsReaderFactory(required: StructType)
      extends PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val dp = p.asInstanceOf[DocsPartition]
      new PartitionReader[InternalRow] {
        private var id = dp.lo - 1
        override def next(): Boolean = { id += 1; id < dp.hi }
        override def get(): InternalRow = {
          // materialize only the projected columns; `text` — the
          // expensive one — is built ONLY when projected (n_chars is
          // computed arithmetically, so select(doc_id, n_chars) never
          // pays string materialization)
          InternalRow.fromSeq(required.fieldNames.toSeq.map {
            case "doc_id" => id
            case "text" => UTF8String.fromString(textFor(id))
            case "lang" => UTF8String.fromString(langFor(id))
            case "source" => UTF8String.fromString(sourceFor(id))
            case "n_chars" => nCharsFor(id)
            case other => throw new IllegalArgumentException(other)
          })
        }
        override def close(): Unit = ()
      }
    }
  }
}
