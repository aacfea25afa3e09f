package graft

import org.apache.spark.sql.SparkSession

/** Low-memory spill gate (r11 VERDICT item 8): run the heaviest checked
  * rows under a CONSTRAINED heap (launch with -Xmx2g) to prove the
  * spill-safety claims the SURVEY §4 table asserts — hash aggregates
  * fall back to sort-based spilling, joins/sorts go external — instead
  * of OOMing. A row passes when it completes and returns the same row
  * count as the reference run; the gate prints one line per row and a
  * final PASS/FAIL summary (exit 1 on any failure).
  *
  * Usage: java -Xmx2g ... graft.SpillCheck [sfDir] [query...]
  */
object SpillCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val qs0 = if (args.length > 1) args.drop(1).toSeq
      else Seq(
        "g_fulfillment_latency", "g_rfm_segments", "d_agg_approx_pctl",
        "t_q05", "d_agg_kll_quantiles", "g_anomaly_mad", "t_q18",
        "g_abc_classification", "t_q02", "d_agg_percentile",
        "d_agg_boxplot", "t_q21", "h_nb_lang_confusion", "t_q16",
        "t_q09", "t_q10", "t_q03", "d_agg_corr_matrix", "h_ccnet_buckets",
        "g_price_index", "i_assoc_rules", "h_cosine_topk",
        "e_win_range_time", "c_join_smj", "g_gini_spend")
    val qs = qs0.filter(SparkEntry.queries.contains)
    val heapMb = Runtime.getRuntime.maxMemory() / (1 << 20)
    System.err.println(s"[spill] heap ${heapMb}MB, sf=$sfDir, " +
      s"${qs.size} rows")
    val spark = SparkSession.builder()
      .master("local[8]") // fewer threads: 2g across 32 execution
      // threads leaves <64MB/task — the gate tests SPILLING, not
      // thread-count-induced thrash; a real 2g executor runs few cores
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var failed = 0
    qs.foreach { q =>
      val t0 = System.nanoTime()
      try {
        val n = SparkEntry.queries(q)(spark, sfDir).count()
        println(f"[spill] ok   $q%-26s rows=$n%8d " +
          f"${(System.nanoTime() - t0) / 1e9}%6.2f s")
      } catch {
        case e: Throwable =>
          failed += 1
          println(s"[spill] FAIL $q: ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).linesIterator.take(1).mkString)
      }
    }
    println(s"[spill] ${qs.size - failed}/${qs.size} rows green at " +
      s"${heapMb}MB heap")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
