package graft
import org.apache.spark.sql.SparkSession

/** Print the number of empty-partitionSpec WindowExec /
  * WindowGroupLimitExec nodes in each declared query's pre-AQE physical
  * plan (the PlanShapeSpec window-gate census) — used to scope the
  * whitelist to exact counts (r15 VERDICT item 7 / ADVICE item 2).
  */
object ProbeWinCount {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    for (n <- names) {
      val c = try {
        SparkEntry.queries(n)(spark, d).queryExecution.sparkPlan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
          case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
            if w.partitionSpec.isEmpty => w
        }.size
      } catch { case e: Throwable => -1 }
      if (c != 0) println(s"$n $c")
    }
    spark.stop()
  }
}
