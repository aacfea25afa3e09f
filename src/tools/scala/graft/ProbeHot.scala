package graft

import org.apache.spark.sql.SparkSession

/** Scratch cost-attribution probe for the round-6 bench hot spots (not
  * part of the contract): times each suspect query cold (first run pays
  * its family's memoized artifact builds, exactly like the bench's timed
  * pass) then warm (memo hit), under the bench's local[32]/32-partition
  * config. Usage: runMain graft.ProbeHot [sfDir] [query...]
  */
object ProbeHot {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val qs = if (args.length > 1) args.drop(1).toSeq
      else Seq("t_q02", "h_cluster_size_hist", "i_graph_cc",
        "i_graph_pagerank", "h_minhash_widevocab", "i_graph_community_lpa",
        // r6 verdict: driver-bench phantom-spike suspects — keep them
        // probed so any recurrence has an isolated quiet-host reading
        "d_agg_corr_matrix", "c_join_smj", "c_join_theta_range",
        "c_join_skew_salted", "t_q11",
        // triangle-pair-join family: bimodal JIT tiering of the
        // bitmask/dot-product pair loops (BASELINE.md 243-row anchor)
        "h_cosine_topk", "h_crosslang_neardup", "h_dedup_threshold_sweep",
        // r9 verdict: ANN family gets the corr_matrix treatment —
        // isolated anchors on current binaries + PlanShapeSpec pins
        "h_ann_lsh", "h_ann_recall", "h_ann_topk_pairs", "h_ann_ivf",
        // r10 third continuation: PCA / BPE family anchors
        "h_pca_power", "h_pca_project", "h_bpe_merges", "h_bpe_tokenize")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm codegen at sf0.001 like the bench sweep does
    val warmDir = "/root/testdata/sf0.001"
    qs.foreach { q =>
      try SparkEntry.queries(q)(spark, warmDir).count()
      catch { case _: Throwable => () }
    }
    qs.foreach { q =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, sfDir).count()
      val cold = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).count()
      val warm = (System.nanoTime() - t1) / 1e9
      println(f"[hot] $q%-26s cold $cold%6.2f s   warm $warm%6.2f s   rows=$n")
    }
    spark.stop()
  }
}
