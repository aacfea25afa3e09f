package graft

import org.apache.spark.sql.SparkSession

/** Scratch: reproduce the 32-thread i_graph_cc cost seen in the driver
  * bench (local[32]: 12-17 s per CC propagation round vs ~1 s at
  * local[8]) and attribute it — run the same build under the bench
  * config and print per-phase wall times + key session confs.
  */
object ProbeCc32 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("adaptive.enabled=" + spark.conf.get("spark.sql.adaptive.enabled"))
    println("autoBroadcastJoinThreshold=" +
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    val t0 = System.nanoTime()
    val n = SparkEntry.queries("i_graph_cc")(spark, d).count()
    println(f"i_graph_cc rows=$n total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
