package graft

import org.apache.spark.sql.SparkSession

/** Plan-quality sweep: prints one line per declared query with the
  * operator counts that matter at 100 TB — shuffles, sorts, nested
  * loops / cartesians (red flags), and whole-stage-codegen coverage.
  * Usage: runMain graft.PlanAudit [sfDir]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(f"${"query"}%-24s ${"exch"}%5s ${"sort"}%5s ${"wscg"}%5s ${"scan"}%5s  flags")
    Registry.all.sortBy(_.name).foreach { q =>
      try {
        // AQE hides children behind AdaptiveSparkPlanExec until execution;
        // audit the initial plan via its string form.
        val s = q.fn(spark, sfDir).queryExecution.executedPlan.toString
        def cnt(p: String) = p.r.findAllMatchIn(s).length
        val exch = cnt("Exchange hashpartitioning") + cnt("Exchange rangepartitioning")
        val srt = cnt("\\bSort \\[")
        val wscg = cnt("WholeStageCodegen") + cnt("\\*\\(\\d+\\)")
        val scan = cnt("FileScan")
        val flags = Seq(
          if (s.contains("BroadcastNestedLoopJoin")) Some("NLJ") else None,
          if (s.contains("CartesianProduct")) Some("CARTESIAN") else None).flatten
        println(f"${q.name}%-24s $exch%5d $srt%5d $wscg%5d $scan%5d  ${flags.mkString(",")}")
      } catch {
        case e: Throwable => println(f"${q.name}%-24s ERROR ${e.getMessage.take(60)}")
      }
    }
    spark.stop()
  }
}
