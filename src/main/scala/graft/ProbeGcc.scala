package graft
import org.apache.spark.sql.SparkSession
/** Dev probe: run i_graph_cc with a full stack trace. */
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
    try {
      SparkEntry.queries("i_graph_cc")(spark, dataRoot).show(50, false)
    } catch { case e: Throwable => e.printStackTrace() }
    spark.stop()
  }
}
