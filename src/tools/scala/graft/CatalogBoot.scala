package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Two-JVM catalog recovery drill (r13 VERDICT item 4): proves a FRESH
  * SparkSession — a genuinely empty in-memory catalog, not a
  * newSession() sharing SharedState — recovers the table f_catalog_ddl
  * published from nothing but the surviving warehouse directory.
  *
  * Usage (two separate JVMs, e.g. two sbt runMain invocations):
  *   runMain graft.CatalogBoot publish   # JVM 1: run f_catalog_ddl
  *   runMain graft.CatalogBoot recover   # JVM 2: catalog is empty;
  *                                       #   re-register from LOCATION
  * Both phases print one PASS/FAIL line; recover exits non-zero on
  * mismatch.
  */
object CatalogBoot {
  private val wh = "/tmp/graft-catboot-wh"
  private val sfDir =
    sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

  def main(args: Array[String]): Unit = {
    val phase = args.headOption.getOrElse("publish")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfx = java.lang.Long.toHexString(sfDir.hashCode.toLong & 0xffffffffL)
    val tbl = s"ord_urgent_$sfx"

    phase match {
      case "publish" =>
        val out = SparkEntry.queries("f_catalog_ddl")(spark, sfDir).collect()
        println(s"[catboot] PUBLISH ok: table $tbl, view v_$tbl, " +
          s"agg rows ${out.length} — " +
          out.map(r => s"${r.get(0)}:${r.get(1)}").mkString(", "))

      case "recover" =>
        // 1. the fresh JVM's in-memory catalog must NOT know the table —
        //    otherwise this drill proves nothing
        require(!spark.catalog.tableExists(tbl),
          s"catalog already knows $tbl — not a fresh JVM?")
        // 2. the warehouse location must have survived the publisher JVM
        val loc = java.nio.file.Paths.get(wh, tbl)
        require(java.nio.file.Files.isDirectory(loc),
          s"no surviving location at $loc — run the publish phase first")
        // 3. recover: external registration over the surviving files
        //    (unpartitioned table → no MSCK needed; the partitioned
        //    variant is pinned in CatalogSpec)
        spark.sql(s"CREATE TABLE ${tbl}_rec USING parquet LOCATION '$loc'")
        spark.sql(s"CREATE OR REPLACE VIEW v_${tbl}_rec AS " +
          s"SELECT o_orderstatus, o_totalprice FROM ${tbl}_rec")
        val got = spark.sql(
          s"""SELECT o_orderstatus, COUNT(*) AS n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
             |FROM v_${tbl}_rec
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
          .collect().map(_.toSeq).toSeq
        // 4. parity against the source-of-truth recomputation
        val want = spark.read
          .parquet(s"$sfDir/orders.parquet")
          .filter(col("o_orderpriority") === "1-URGENT")
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(38,6)"))
              .cast("double").as("total"))
          .orderBy("o_orderstatus")
          .collect().map(_.toSeq).toSeq
        spark.sql(s"DROP VIEW v_${tbl}_rec")
        spark.sql(s"DROP TABLE ${tbl}_rec")
        if (got == want) println(s"[catboot] RECOVER PASS: fresh JVM " +
          s"re-registered $tbl from $loc, agg matches source " +
          s"(${got.length} groups)")
        else {
          println(s"[catboot] RECOVER FAIL: got $got want $want")
          sys.exit(1)
        }
    }
    spark.stop()
  }
}
