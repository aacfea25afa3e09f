package graft
import org.apache.spark.sql.SparkSession
object ProbeTq {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    for (q <- Seq("t_q02", "t_q09", "t_q11", "t_q12", "t_q16", "t_q20", "t_q21")) {
      val df = SparkEntry.queries(q)(spark, d)
      val t0 = System.nanoTime(); val n = df.count()
      println(f"== $q rows=$n  ${(System.nanoTime()-t0)/1e9}%.2f s")
      val plan = df.queryExecution.executedPlan.toString
      val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin").filter(plan.contains)
      if (bad.nonEmpty) println(s"   ANTIPATTERN: ${bad.mkString(",")}")
      println(plan.linesIterator.filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Window")).map(_.trim.take(120)).mkString("\n"))
    }
    spark.stop()
  }
}
