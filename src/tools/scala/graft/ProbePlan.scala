package graft
import org.apache.spark.sql.SparkSession
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    for (q <- args) {
      println(s"===== $q =====")
      val df = Registry.queries(q)(spark, d)
      df.explain("formatted")
    }
    spark.stop()
  }
}
