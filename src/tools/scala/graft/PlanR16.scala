package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` of named queries to
  * plans/r16/<query>_<tag>.txt under the bench session config — the
  * before/after plan evidence for the r16 optimization round.
  * Usage: runMain graft.PlanR16 <tag> <query> [query ...]
  */
object PlanR16 {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanR16 <tag> <query> [query ...]")
    val tag = args.head
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("plans/r16"))
    for (q <- args.tail) {
      val df = SparkEntry.queries(q)(spark, d)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"plans/r16/${q}_$tag.txt"),
        s"== $q @ $d (tag: $tag) ==\n" + plan)
      System.err.println(s"[plan] wrote plans/r16/${q}_$tag.txt")
    }
    spark.stop()
  }
}
