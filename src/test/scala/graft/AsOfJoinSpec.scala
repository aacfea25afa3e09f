package graft

import graft.io.Io
import graft.plans.AsOf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native sort-merge as-of join must agree exactly with the composed
  * range-join + top-1-window formulation that the checked query
  * `c_join_asof` uses (which itself hash-matches DuckDB's ASOF JOIN).
  */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark._

  private def purchases = Io.events(spark, sf)
    .filter(col("event_type") === "purchase")
    .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts_us").as("p_us"))

  private def clicks = Io.events(spark, sf)
    .filter(col("event_type") === "click")
    .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts_us").as("c_us"))

  test("native as-of join == window-based formulation == DuckDB-checked query") {
    val native = AsOf.join(purchases, clicks, "p_user", "c_user", "p_us", "c_us")
      .select("p_id", "c_id", "p_us", "c_us")
    val composed = Registry.queries("c_join_asof")(spark, sf)
      .select(col("p_id"), col("c_id"), col("p_us"), col("c_us"))
    val n = native.collect().map(_.toSeq).toSet
    val c = composed.collect().map(_.toSeq).toSet
    assert(n === c)
    assert(n.nonEmpty)
  }

  test("plan is the single-pass AsOfJoinExec, not a range join") {
    val df = AsOf.join(purchases, clicks, "p_user", "c_user", "p_us", "c_us")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("tolerance: native exec == composed DuckDB-checked query") {
    val native = AsOf.join(purchases, clicks, "p_user", "c_user", "p_us", "c_us",
        toleranceUs = 3600000000L)
      .select("p_id", "c_id", "p_us", "c_us")
    val composed = Registry.queries("c_join_asof_tol")(spark, sf)
      .select(col("p_id"), col("c_id"), col("p_us"), col("c_us"))
    val n = native.collect().map(_.toSeq).toSet
    val c = composed.collect().map(_.toSeq).toSet
    assert(n === c)
    assert(n.nonEmpty)
    // the tolerance must actually bite on this data
    val unlimited = AsOf.join(purchases, clicks, "p_user", "c_user", "p_us", "c_us")
    assert(unlimited.count() > n.size)
  }

  test("left rows with no prior right row are dropped (inner semantics)") {
    import spark.implicits._
    val l = Seq((1L, 100L, "a"), (1L, 50L, "b"), (2L, 10L, "c"))
      .toDF("lk", "lts", "tag")
    val r = Seq((1L, 60L, "x"), (1L, 90L, "y"), (3L, 5L, "z"))
      .toDF("rk", "rts", "rtag")
    val out = AsOf.join(l, r, "lk", "rk", "lts", "rts")
      .select("tag", "rtag").collect().map(r => (r.getString(0), r.getString(1))).toSet
    // tag=a (ts 100) matches y (90); tag=b (ts 50) has no click <= 50; key 2 unmatched
    assert(out === Set(("a", "y")))
  }
}
