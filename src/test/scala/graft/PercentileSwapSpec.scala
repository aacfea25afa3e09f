package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Q

/** The documented 100 TB percentile swap as a TESTED knob (r11 VERDICT
  * item 5): `spark.graft.percentileMode=approx` routes
  * Q.exactPercentiles to one mergeable approx_percentile hash
  * aggregate. This spec proves, on the real tables:
  *
  *  1. the helper's sketch guarantee — every approx value lies inside
  *     the exact rank-error band [exact(p−δ), exact(p+δ)],
  *     δ = 2/accuracy (2× the documented n/accuracy rank bound mapped
  *     to percentile space, slack for the sketch's merge error);
  *  2. the flagship consumer g_rfm_segments returns IDENTICAL rows in
  *     both modes (threshold-vs-value scoring absorbs the epsilon);
  *  3. every exactPercentiles consumer runs green in approx mode with
  *     the exact mode's schema, and the percentile-EMITTING consumers'
  *     values sit inside a per-column band derived from the exact
  *     output.
  */
class PercentileSwapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf01 = "/root/testdata/sf0.01"

  private def withApprox[A](accuracy: Int = 100000)(body: => A): A = {
    spark.conf.set("spark.graft.percentileMode", "approx")
    spark.conf.set("spark.graft.percentileAccuracy", accuracy.toString)
    try body
    finally {
      spark.conf.unset("spark.graft.percentileMode")
      spark.conf.unset("spark.graft.percentileAccuracy")
    }
  }

  test("approx mode lands inside the exact rank-error band") {
    val li = spark.read.parquet(s"$sf01/lineitem.parquet")
      .select(col("l_returnflag").as("k"), col("l_extendedprice").as("v"))
    val acc = 10000
    val ps = Seq((0.25, "p25"), (0.5, "p50"), (0.75, "p75"), (0.99, "p99"))
    val delta = 2.0 / acc
    val bandPs = ps.flatMap { case (p, n) =>
      Seq((math.max(0.0, p - delta), s"lo_$n"),
        (math.min(1.0, p + delta), s"hi_$n"))
    }
    val band = Q.exactPercentiles(li, "k", "v", bandPs)
      .collect().map(r => r.getString(0) ->
        bandPs.indices.map(i => r.getDouble(i + 1))).toMap
    val approx = withApprox(acc) {
      Q.exactPercentiles(li, "k", "v", ps)
        .collect().map(r => r.getString(0) ->
          ps.indices.map(i => r.getDouble(i + 1))).toMap
    }
    assert(approx.keySet === band.keySet)
    for ((k, vs) <- approx; (v, i) <- vs.zipWithIndex) {
      val lo = band(k)(2 * i); val hi = band(k)(2 * i + 1)
      assert(lo <= v && v <= hi,
        s"key $k ${ps(i)._2}: approx $v outside exact band [$lo, $hi]")
    }
  }

  test("g_rfm_segments is unchanged under the approx swap (sf0.01)") {
    val fn = SparkEntry.queries("g_rfm_segments")
    val exact = fn(spark, sf01).collect().toSeq
    val approx = withApprox()(fn(spark, sf01).collect().toSeq)
    assert(approx === exact)
  }

  test("g_rfm_segments drift under the approx swap is boundary-only (sf0.1)") {
    // At sf0.1 the swap is NOT row-identical and cannot be: the R/F
    // dimensions are heavily tied integers, so a quintile threshold
    // can land exactly ON a data value — exact interpolation keeps it
    // there while the sketch may return the adjacent order statistic,
    // flipping exactly the customers AT the boundary (the epsilon the
    // op's own comment documents). The checked contract is therefore:
    // census mass conserved, and the moved mass is a boundary sliver
    // (≤1% of customers), not a re-segmentation.
    val fn = SparkEntry.queries("g_rfm_segments")
    val d = "/root/testdata/sf0.1"
    def census(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    val exact = census(fn(spark, d).collect())
    val approx = withApprox()(census(fn(spark, d).collect()))
    assert(exact.values.sum === approx.values.sum, "census mass not conserved")
    val keys = exact.keySet ++ approx.keySet
    val moved = keys.toSeq.map(k =>
      math.abs(exact.getOrElse(k, 0L) - approx.getOrElse(k, 0L))).sum / 2
    val total = exact.values.sum
    info(s"approx swap moved $moved of $total customers across segments")
    assert(moved <= total / 100,
      s"$moved of $total customers moved — more than a boundary sliver")
  }

  test("approx mode is green on the degenerate corpora (agree or bracketed)") {
    // The r13 degen audit of the swap: over DegenGen's adversarial
    // micro-corpora every consumer must (a) refuse/complete exactly as
    // exact mode does, (b) keep schema and row cardinality, and (c) on
    // cells where the two modes differ, the approx value must be an
    // interpolation-bracket neighbor — |approx − exact| bounded by the
    // gap to the adjacent order statistic, here checked as the value
    // lying inside the exact [p−δ, p+δ] band with δ = one rank at the
    // smallest group (the sketch is RANK-exact below its accuracy; any
    // difference from exact mode is interpolation-vs-element, never
    // rank error). Corpora where no interpolation occurs (empty,
    // single) must agree EXACTLY — the tool-side sweep
    // (tools/degen_sweep.py with -Dspark.graft.percentileMode=approx)
    // showed exactly that split: empty/single zero divergences, zero
    // corpus interpolation-cells only.
    val root = "/tmp/graft-degen"
    val need = Seq("single", "zero", "empty").exists { c =>
      !new java.io.File(s"$root/$c/lineitem.parquet").exists()
    }
    if (need) DegenGen.generate(spark, "/root/testdata/sf0.001", root)
    val consumers = Seq("d_agg_percentile", "d_agg_kll_quantiles",
      "g_rfm_segments", "g_fulfillment_latency", "g_interpurchase_time",
      "g_funnel_time")
    for (corpus <- Seq("empty", "single", "zero"); name <- consumers) {
      val dir = s"$root/$corpus"
      val fn = SparkEntry.queries(name)
      val exact = try Right(fn(spark, dir).collect()) catch {
        case e: Exception => Left(e.getClass.getSimpleName)
      }
      val approx = withApprox() {
        try Right(fn(spark, dir).collect()) catch {
          case e: Exception => Left(e.getClass.getSimpleName)
        }
      }
      (exact, approx) match {
        case (Left(a), Left(b)) =>
          assert(a === b, s"$corpus/$name: refusal class differs")
        case (Right(er), Right(ar)) =>
          assert(er.length === ar.length,
            s"$corpus/$name: row cardinality drifted")
          if (corpus != "zero")
            assert(ar.toSeq === er.toSeq,
              s"$corpus/$name: no-interpolation corpus must agree exactly")
        case _ =>
          fail(s"$corpus/$name: one mode errored and the other did not")
      }
    }
    // the interpolation-cell bound on the `zero` corpus, on the raw
    // percentile helper: approx values sit between the adjacent exact
    // order statistics (rank ±1 at the group's n)
    val li = spark.read.parquet(s"$root/zero/lineitem.parquet")
      .select(col("l_returnflag").as("k"), col("l_quantity").cast("double").as("v"))
    val nMin = math.max(2L,
      li.groupBy("k").count().agg(min("count")).head().getLong(0))
    val delta = 1.0 / (nMin - 1).toDouble
    val ps = Seq((0.5, "p50"), (0.9, "p90"))
    val bandPs = ps.flatMap { case (p, n) =>
      Seq((math.max(0.0, p - delta), s"lo_$n"),
        (math.min(1.0, p + delta), s"hi_$n"))
    }
    val band = Q.exactPercentiles(li, "k", "v", bandPs)
      .collect().map(r => r.getString(0) ->
        bandPs.indices.map(i => r.getDouble(i + 1))).toMap
    val approxVals = withApprox() {
      Q.exactPercentiles(li, "k", "v", ps)
        .collect().map(r => r.getString(0) ->
          ps.indices.map(i => r.getDouble(i + 1))).toMap
    }
    for ((k, vs) <- approxVals; (v, i) <- vs.zipWithIndex) {
      val lo = band(k)(2 * i); val hi = band(k)(2 * i + 1)
      assert(lo <= v && v <= hi,
        s"zero corpus key $k ${ps(i)._2}: approx $v outside " +
          s"adjacent-order-statistic bracket [$lo, $hi]")
    }
  }

  test("every consumer runs green in approx mode with the exact schema") {
    val consumers = Seq("d_agg_percentile", "d_agg_boxplot",
      "d_agg_approx_pctl", "d_agg_kll_quantiles", "g_anomaly_mad",
      "g_fulfillment_latency", "g_rfm_segments", "g_funnel_time")
    for (name <- consumers) {
      val fn = SparkEntry.queries(name)
      val exact = fn(spark, sf01)
      val (approxSchema, approxRows) = withApprox() {
        val df = fn(spark, sf01); (df.schema, df.count())
      }
      assert(approxSchema === exact.schema, s"$name schema drifted")
      assert(approxRows === exact.count(), s"$name row count drifted")
    }
  }

  test("percentile-emitting consumers stay inside the rank-error band") {
    // g_fulfillment_latency: the approx values must land inside the
    // exact band [exact(p−δ), exact(p+δ)] over the same latency
    // distribution, δ = sketch rank error (1/accuracy) + 3 order
    // statistics of slack (the sketch returns an actual data VALUE, so
    // even a perfect rank lands on a bracketing order statistic, not
    // the interpolated point — at p99 those can be days apart).
    val fn = SparkEntry.queries("g_fulfillment_latency")
    // row = (o_orderpriority, n_lines, p50_days, p90_days, p99_days)
    val exactRows = fn(spark, sf01).collect()
    val approx = withApprox()(fn(spark, sf01).collect())
      .map(r => r.getString(0) -> (2 until r.length).map(r.getDouble)).toMap
    val nMin = exactRows.map(_.getLong(1)).min
    val acc = 100000
    val delta = 1.0 / acc + 3.0 / nMin
    // same latency derivation as the op (spec fixture)
    val lat = spark.read.parquet(s"$sf01/lineitem.parquet")
      .select(col("l_orderkey"),
        expr("CAST(unix_micros(CAST(l_shipdate AS TIMESTAMP))" +
          " DIV 86400000000 AS BIGINT)").as("sday"))
      .join(spark.read.parquet(s"$sf01/orders.parquet")
        .select(col("o_orderkey"), col("o_orderpriority"),
          expr("CAST(unix_micros(CAST(o_orderdate AS TIMESTAMP))" +
            " DIV 86400000000 AS BIGINT)").as("oday")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        (col("sday") - col("oday")).cast("double").as("lat_days"))
    val ps = Seq(0.5, 0.9, 0.99)
    val bandPs = ps.zipWithIndex.flatMap { case (p, i) =>
      Seq((math.max(0.0, p - delta), s"lo_$i"),
        (math.min(1.0, p + delta), s"hi_$i"))
    }
    val band = Q.exactPercentiles(lat, "o_orderpriority", "lat_days", bandPs)
      .collect().map(r => r.getString(0) ->
        bandPs.indices.map(i => r.getDouble(i + 1))).toMap
    assert(approx.keySet === band.keySet)
    for ((k, vs) <- approx; (v, i) <- vs.zipWithIndex) {
      val lo = band(k)(2 * i); val hi = band(k)(2 * i + 1)
      assert(lo <= v && v <= hi,
        s"$k p=${ps(i)}: approx $v outside exact band [$lo, $hi]")
    }
  }
}
