package graft

import org.apache.spark.sql.SparkSession

/** One shared session for the whole suite (Spark startup dominates test
  * wall-clock otherwise). Mirrors the Verify/Bench session config.
  */
object TestSpark {
  val sf: String = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      // local[4, 2] = 4 threads, maxFailures 2: a failed task gets ONE
      // retry, which is what lets SourceSpec drive a real scheduler-
      // level task retry through the DSv2 commit protocol (a plain
      // local[4] fails the job on the first task failure). Tests that
      // assert a poisoned job FAILS still hold — their fault is
      // deterministic, so the retry fails identically.
      .master("local[4, 2]")
      .appName("upflowspark-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
