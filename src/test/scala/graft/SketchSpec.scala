package graft

import graft.io.Io
import graft.ops.EtlOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mergeable-sketch maintenance (EtlOps.hllPartials/hllMergedCounts):
  * the incremental-distinct story for 100 TB ingestion — per-partition
  * DataSketches HLL sketches merged at read time instead of re-scanning
  * history. The tests prove the two properties the pattern rests on.
  */
class SketchSpec extends AnyFunSuite {
  import TestSpark._

  test("partition-wise HLL sketches merge to the single-pass estimate exactly") {
    // split orders into "history" and "fresh" partitions like
    // e_incremental_agg, sketch each side independently, merge — the
    // union estimate must equal the one-shot sketch over all rows
    // bit-for-bit (same deterministic algorithm; equality IS the merge
    // associativity proof, not an approximation tolerance).
    val orders = Io.table(spark, sf, "orders")
    val cut = to_date(lit("1998-01-01"))
    val hist = EtlOps.hllPartials(orders.filter(col("o_orderdate") < cut),
      "o_orderstatus", "o_custkey")
    val fresh = EtlOps.hllPartials(orders.filter(col("o_orderdate") >= cut),
      "o_orderstatus", "o_custkey")
    val merged = EtlOps.hllMergedCounts(hist.union(fresh), "o_orderstatus")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val onePass = EtlOps.hllMergedCounts(
      EtlOps.hllPartials(orders, "o_orderstatus", "o_custkey"), "o_orderstatus")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged === onePass)
  }

  test("merged HLL estimate lands within 5% of the exact distinct count") {
    val orders = Io.table(spark, sf, "orders")
    val cut = to_date(lit("1998-01-01"))
    val parts = EtlOps.hllPartials(orders.filter(col("o_orderdate") < cut),
        "o_orderstatus", "o_custkey")
      .union(EtlOps.hllPartials(orders.filter(col("o_orderdate") >= cut),
        "o_orderstatus", "o_custkey"))
    val approx = EtlOps.hllMergedCounts(parts, "o_orderstatus")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = orders.groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex).toDouble / ex < 0.05, s"$k: approx $ap vs exact $ex")
    }
  }

  test("merge order does not change the estimate (commutativity)") {
    val orders = Io.table(spark, sf, "orders")
    val cut = to_date(lit("1998-01-01"))
    val a = EtlOps.hllPartials(orders.filter(col("o_orderdate") < cut),
      "o_orderstatus", "o_custkey")
    val b = EtlOps.hllPartials(orders.filter(col("o_orderdate") >= cut),
      "o_orderstatus", "o_custkey")
    val ab = EtlOps.hllMergedCounts(a.union(b), "o_orderstatus")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ba = EtlOps.hllMergedCounts(b.union(a), "o_orderstatus")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ab === ba)
  }
}
