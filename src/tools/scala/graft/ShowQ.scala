package graft

import org.apache.spark.sql.SparkSession

/** Print a checked query's OUTPUT rows at an arbitrary corpus dir —
  * used to record quality metrics (ANN recall@k, MRR/nDCG) at the sf1
  * scale corpus, where parity has no oracle run but the metric value
  * itself is the evidence (SCALE.md). Usage:
  *   runMain graft.ShowQ <sfDir> <queryName> [queryName ...]
  */
object ShowQ {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ShowQ <sfDir> <query> [query ...]")
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args.tail) {
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(q)(spark, sfDir).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[showq] $q @ $sfDir ($sec%.1f s, ${rows.length} rows):")
      rows.take(25).foreach(r => println(s"[showq]   $r"))
    }
    spark.stop()
  }
}
