package graft

import graft.ops.EtlOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `observe()` metrics surface (EtlOps.observedRun): per-run pipeline
  * metrics collected inside the SAME job as the query — the production
  * monitoring hook a scheduler reads after each run, with no second
  * pass over the data.
  */
class ObserveSpec extends AnyFunSuite {
  import TestSpark._

  test("observedRun reports exact row count and decimal sum of the run") {
    val base = Registry.queries("a_scan_project")(spark, sf)
    val (df, obs) = EtlOps.observedRun(base, "l_quantity")
    val n = df.count() // the action that materializes the metrics
    val m = obs.get
    assert(m("n_rows") === n)
    // independently recomputed exact-decimal sum must match the
    // map-side-collected metric bit-for-bit (same decSum form)
    val expect = base.agg(graft.ops.Q.decSum(col("l_quantity"))).collect().head.getDouble(0)
    assert(m("sum_l_quantity") === expect)
  }

  test("observed metrics survive a transform above the observe node") {
    val base = Registry.queries("a_scan_project")(spark, sf)
    val (df, obs) = EtlOps.observedRun(base, "l_extendedprice")
    // downstream consumer filters AFTER the observation point: the
    // metrics still describe the full observed relation, not the
    // filtered remainder — the semantics a DQ gate relies on.
    val kept = df.filter(col("l_quantity") > 25.0).count()
    val m = obs.get
    assert(m("n_rows").asInstanceOf[Long] > kept)
    assert(m("n_rows") === base.count())
  }
}
