package graft
import org.apache.spark.sql.SparkSession
object ProbeQ2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries("t_q02")(spark, sfDir)
    var t0 = System.nanoTime(); df.count()
    println(f"cold ${(System.nanoTime()-t0)/1e9}%.2f s")
    val df2 = SparkEntry.queries("t_q02")(spark, sfDir)
    t0 = System.nanoTime(); df2.count()
    println(f"warm ${(System.nanoTime()-t0)/1e9}%.2f s")
    println(df2.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Scan") || l.contains("Aggregate"))
      .map(_.take(150)).mkString("\n"))
    spark.stop()
  }
}
