package graft

import org.apache.spark.sql.SparkSession

/** Scale-slope measurement for the r12 SCALE.md gate: run the heaviest
  * checked rows at two scale factors (default sf0.1 and the ScaleGen
  * sf1 derivative — 10× the rows) in ONE session and report per-row
  * warm wall-clock and the t(B)/t(A) slope. A near-linear operator
  * lands ≲12× at 10× data (linear + per-stage constant amortization);
  * documented-quadratic yardsticks (the exact all-pairs rows) are
  * annotated EXPECTED_QUADRATIC and graded against ~100× instead.
  *
  * Protocol mirrors the bench: every query runs cold (first run pays
  * its family's memoized artifact builds at that SF) then warm (memo
  * hit, steady-state plan) — the slope is computed on WARM times so
  * one-time artifact builds don't pollute the per-query exponent; the
  * builds' own slope is visible in the cold columns and the [artifact]
  * stderr lines.
  *
  * Usage: runMain graft.ScaleCheck [dirA] [dirB] [query...]
  * Output: one JSON line per query on stdout + target/scale_check.json
  */
object ScaleCheck {

  // the heaviest rows of the r11 bench (>=~1s) plus the families whose
  // 100 TB claims most need empirical slope evidence (dedup chain, CC,
  // ANN, PCA, markov, percentile machinery)
  val DefaultQueries: Seq[String] = Seq(
    "g_fulfillment_latency", "g_rfm_segments", "d_agg_approx_pctl",
    "t_q05", "d_agg_kll_quantiles", "g_anomaly_mad", "f_sql_script_iter",
    "t_q18", "g_abc_classification", "t_q02",
    "d_agg_percentile", "d_agg_boxplot", "t_q21", "h_nb_lang_confusion",
    "h_mmr_rerank", "t_q16", "t_q09", "t_q10", "t_q03",
    "d_agg_corr_matrix", "h_ccnet_buckets",
    "g_price_index", "i_assoc_rules",
    // scale-risk families beyond the raw top list. The docMasks dedup
    // rows (h_minhash_lsh_dedup and the CC family on top of it) are
    // back in the table as of r13: docMasks is width-adaptive — the
    // sf1 corpus's 89-token vocabulary routes to array<long> masks
    // (the r12 fail-loud 64-token guard is gone), so these rows are
    // scale-continuous alongside the always-open-vocab paths
    // (digest dedup, widevocab MinHash).
    "h_minhash_lsh_dedup", "h_dedup_clusters", "h_cluster_size_hist",
    "h_dedup_method_agreement",
    "h_exact_dedup", "h_line_dedup", "h_minhash_widevocab",
    "i_graph_cc", "c_join_5way", "g_session_30m", "h_ann_ivf",
    "h_ann_hnsw",           // r15: graph-ANN build + bucket-seeded search
    "h_ann_hnsw_hops",      // r15: per-hop recall/cost curve
    "h_pca_power", "g_markov_attribution", "h_prefix_filter_pairs",
    "e_table_checksum", "q1_agg",
    // exact all-pairs yardsticks: O(n^2) BY DESIGN (the approximate
    // rows are graded against them); expected slope ~100x at 10x docs.
    // h_ann_recall's ground-truth side IS the same all-pairs top-10.
    "h_cosine_topk", "h_ann_recall")

  val ExpectedQuadratic: Set[String] = Set("h_cosine_topk", "h_ann_recall")

  def main(args: Array[String]): Unit = {
    val dirA = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dirB = if (args.length > 1) args(1) else "/tmp/graft-sf1"
    val qs0 = if (args.length > 2) args.drop(2).toSeq else DefaultQueries
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

    // codegen warm-up at the smallest SF (bench discipline)
    val warmDir = "/root/testdata/sf0.001"
    qs.foreach { q =>
      try SparkEntry.queries(q)(spark, warmDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[scale] warm FAILED $q: ${e.getMessage}") }
    }

    // warm = min of two runs (a GC/compilation excursion landing on a
    // single warm reading must not read as an algorithmic slope — the
    // Bench gc-outlier-retry discipline)
    def run(q: String, dir: String): (Double, Double, Long) = {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, dir).count()
      val cold = (System.nanoTime() - t0) / 1e9
      val warm = (1 to 2).map { _ =>
        val t1 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir).count()
        (System.nanoTime() - t1) / 1e9
      }.min
      (cold, warm, n)
    }

    // all of A first, then all of B: artifact chains build once per
    // (SF, chain) and consumers within an SF measure against resident
    // artifacts, exactly like the bench's timed pass
    val a = qs.map { q =>
      val r = run(q, dirA)
      System.err.println(f"[scale] A $q%-26s cold ${r._1}%7.2f warm ${r._2}%7.2f")
      q -> r
    }.toMap
    // Release the A-phase memoized artifacts before B runs: their
    // checkpoint blocks are dead weight under the 10x corpus (the r5
    // bench lesson — measured here as t_q21 reading 16x in-sweep vs
    // 1.47x isolated before this release existed).
    graft.ops.Q.releaseSession(spark)
    System.gc()
    val b = qs.map { q =>
      val r = try run(q, dirB) catch {
        case e: Throwable =>
          System.err.println(s"[scale] B FAILED $q: ${e.getClass.getSimpleName}: ${e.getMessage}")
          (-1.0, -1.0, -1L)
      }
      System.err.println(f"[scale] B $q%-26s cold ${r._1}%7.2f warm ${r._2}%7.2f")
      q -> r
    }.toMap

    val lines = qs.map { q =>
      val (ac, aw, an) = a(q); val (bc, bw, bn) = b(q)
      val ratio = if (aw > 0 && bw >= 0) bw / aw else -1.0
      val flag = if (ExpectedQuadratic.contains(q)) ",\"quadratic\":true" else ""
      f"""{"q":"$q","a_cold":$ac%.2f,"a_warm":$aw%.2f,"a_rows":$an,""" +
        f""""b_cold":$bc%.2f,"b_warm":$bw%.2f,"b_rows":$bn,""" +
        f""""ratio_warm":$ratio%.2f$flag}"""
    }
    lines.foreach(println)
    val doc = "[" + lines.mkString(",\n") + "]"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
    java.nio.file.Files.write(java.nio.file.Paths.get("target/scale_check.json"),
      doc.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
