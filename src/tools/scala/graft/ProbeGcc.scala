package graft
import org.apache.spark.sql.SparkSession
/** Dev probe: run the whole i_graph_* family with timings and full
  * stack traces (also surfaces the CC / k-core convergence-round lines
  * the iterative builds print to stderr). */
object ProbeGcc {
  def main(args: Array[String]): Unit = {
    val dataRoot = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- SparkEntry.queries.keys.filter(_.startsWith("i_graph_")).toSeq.sorted) {
      try {
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(q)(spark, dataRoot).count()
        println(f"== $q rows=$n  ${(System.nanoTime() - t0) / 1e9}%.2f s")
      } catch { case e: Throwable => println(s"== $q FAILED"); e.printStackTrace() }
    }
    spark.stop()
  }
}
