package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe (not part of the contract): does ANALYZE TABLE + CBO
  * change the physical join strategy / join order on this Spark build?
  * Informs a PlanShapeSpec pin for the statistics story.
  */
object ProbeCbo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_cbo_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (t <- Seq("lineitem", "orders", "customer", "nation"))
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.mode("overwrite").saveAsTable(s"cbo_$t")

    val q =
      """SELECT count(*) AS n
        |FROM cbo_orders o
        |JOIN cbo_lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN cbo_customer c ON c.c_custkey = o.o_custkey
        |JOIN cbo_nation n ON n.n_nationkey = c.c_nationkey AND n.n_name = 'NATION_7'
        |""".stripMargin

    def show(tag: String): Unit = {
      val df = spark.sql(q)
      df.collect()
      val p = df.queryExecution.executedPlan
      println(s"== $tag ==")
      println("joins: " + p.toString.linesIterator
        .filter(l => l.contains("Join")).map(_.trim.take(100)).mkString("\n       "))
      println("optimized stats rowCount: " +
        df.queryExecution.optimizedPlan.stats.rowCount)
    }

    show("no stats, no cbo")
    for (t <- Seq("lineitem", "orders", "customer", "nation"))
      spark.sql(s"ANALYZE TABLE cbo_$t COMPUTE STATISTICS FOR ALL COLUMNS")
    show("stats, no cbo")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    show("stats + cbo + joinReorder")
    spark.stop()
  }
}
