package graft.ops

import graft.io.Io
import org.apache.spark.sql.functions._
import Q._

/** SURVEY.md §2-A — scans / sources. Columnar parquet scans with
  * projection pushdown (ReadSchema stays at the selected columns) and,
  * for the events table, the ns-timestamp ingestion wrapper (G1/G2).
  */
object ScanOps {

  val all: Seq[Q] = Seq(
    Q("a_scan_project", (s, d) => {
      Io.table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
        // (l_orderkey, l_linenumber) is NOT unique in this data — total
        // order requires every emitted column (full rows are unique).
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    }, Some(
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin)),

    Q("a_scan_events_ns", (s, d) => {
      Io.events(s, d)
        .select(col("event_id"), col("ts_us"), col("user_id"), col("event_type"), col("value"))
        .orderBy("event_id")
    }, Some(
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
        |FROM events ORDER BY event_id""".stripMargin)),

    Q("a_count_star", (s, d) => {
      Io.allTables.map { t =>
        val df = if (t == "events") Io.events(s, d) else Io.table(s, d, t)
        df.agg(count(lit(1)).as("n_rows")).select(lit(t).as("tbl"), col("n_rows"))
      }.reduce(_ unionByName _).orderBy("tbl")
    }, Some(
      Io.allTables.map(t => s"SELECT '$t' AS tbl, COUNT(*) AS n_rows FROM $t")
        .mkString("", " UNION ALL ", " ORDER BY tbl")))
  )
}
