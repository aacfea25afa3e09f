package graft

import org.apache.spark.sql.SparkSession

/** Measure the bench's host-speed canary on the current host: one warm
  * run (codegen compile), then N timed readings. The MEDIAN of a quiet
  * session is what goes into anchors.json meta as "canary_sec" — the
  * denominator of the gate's host-drift factor (Bench.canaryOnce).
  * Usage: runMain graft.ProbeCanary [nRuns]
  */
object ProbeCanary {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 9
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.canaryOnce(spark) // warm
    val xs = (1 to n).map { i =>
      val v = Bench.canaryOnce(spark)
      System.err.println(f"[canary] run $i%2d: $v%.3f s")
      v
    }
    val s = xs.sorted
    val med = if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
    println(f"""{"canary_runs":${xs.map(v => f"$v%.3f").mkString("[", ",", "]")},""" +
      f""""median":$med%.3f,"min":${s.head}%.3f,"max":${s.last}%.3f}""")
    spark.stop()
  }
}
