package graft

import org.apache.spark.sql.SparkSession

/** Scratch stage-timing probe for h_ccnet_buckets (not part of the
  * contract): times the query three times and prints the final AQE
  * plan of the last run, to localize the warm-run slowdown.
  */
object ProbeCcnet {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ccnet] $label%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$r")
    }
    for (i <- 1 to 3)
      time(s"run$i")(Registry.queries("h_ccnet_buckets")(spark, sfDir).count())
    val df = Registry.queries("h_ccnet_buckets")(spark, sfDir)
    df.count()
    println(df.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
