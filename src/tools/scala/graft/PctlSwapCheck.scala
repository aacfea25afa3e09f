package graft

import org.apache.spark.sql.SparkSession

/** Exact-vs-approx percentile timing at scale (r12 VERDICT item 5):
  * run the Q.exactPercentiles consumer rows at a given SF in BOTH modes
  * (spark.graft.percentileMode = exact | approx) and report per-row
  * warm wall-clock + speedup — the empirical backing for the documented
  * 100 TB swap (Q.scala's exactPercentiles scaladoc; output-tolerance
  * is PercentileSwapSpec's job, this tool measures COST).
  *
  * Protocol mirrors ScaleCheck: sf0.001 codegen warm-up, then per mode
  * a cold run (pays that mode's plan compile) + warm = min of two.
  * Artifacts memoized under one mode are released before the other
  * runs (the percentile mode is part of the plan, so a stale memo
  * would serve the WRONG mode's table).
  *
  * Usage: runMain graft.PctlSwapCheck [sfDir] [query...]
  * Output: one JSON line per (query, mode) + target/pctl_swap.json
  */
object PctlSwapCheck {

  // every checked row whose plan routes through Q.exactPercentiles
  // (grep consumers), heaviest first — g_rfm_segments (6.42 s warm sf1
  // in r12) and g_fulfillment_latency (5.58 s) are the two slowest
  // scale-gate rows and both sit on the two-pass exact rank.
  val DefaultQueries: Seq[String] = Seq(
    "g_rfm_segments", "g_fulfillment_latency", "g_interpurchase_time",
    "g_funnel_time", "d_agg_percentile", "d_agg_kll_quantiles")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-sf1")
    val qs0 = if (args.length > 1) args.drop(1).toSeq else DefaultQueries
    val qs = qs0.filter(SparkEntry.queries.contains)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val warmDir = "/root/testdata/sf0.001"

    def measure(mode: String): Map[String, (Double, Double)] = {
      spark.conf.set("spark.graft.percentileMode", mode)
      // the mode is part of the plan: artifacts memoized under the
      // other mode must not serve this one
      graft.ops.Q.releaseSession(spark)
      System.gc()
      qs.foreach { q =>
        try SparkEntry.queries(q)(spark, warmDir).count()
        catch { case e: Throwable =>
          System.err.println(s"[pctl] warm FAILED $q ($mode): ${e.getMessage}") }
      }
      qs.map { q =>
        val r = try {
          val t0 = System.nanoTime()
          SparkEntry.queries(q)(spark, sfDir).count()
          val cold = (System.nanoTime() - t0) / 1e9
          val warm = (1 to 2).map { _ =>
            val t1 = System.nanoTime()
            SparkEntry.queries(q)(spark, sfDir).count()
            (System.nanoTime() - t1) / 1e9
          }.min
          (cold, warm)
        } catch {
          case e: Throwable =>
            System.err.println(s"[pctl] FAILED $q ($mode): ${e.getMessage}")
            (-1.0, -1.0)
        }
        System.err.println(f"[pctl] $mode%-6s $q%-24s cold ${r._1}%7.2f warm ${r._2}%7.2f")
        q -> r
      }.toMap
    }

    val exact = measure("exact")
    val approx = measure("approx")

    val lines = qs.map { q =>
      val (ec, ew) = exact(q); val (ac, aw) = approx(q)
      val speedup = if (aw > 0 && ew >= 0) ew / aw else -1.0
      f"""{"q":"$q","sf":"$sfDir","exact_cold":$ec%.2f,"exact_warm":$ew%.2f,""" +
        f""""approx_cold":$ac%.2f,"approx_warm":$aw%.2f,"speedup_warm":$speedup%.2f}"""
    }
    lines.foreach(println)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
    java.nio.file.Files.write(java.nio.file.Paths.get("target/pctl_swap.json"),
      ("[" + lines.mkString(",\n") + "]")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
