package graft.ops

import graft.io.Io
import org.apache.spark.sql.functions._
import Q._

/** SURVEY.md §2-B — predicates. All of these push to the parquet scan
  * (`PushedFilters` in the formatted plan) — verified in PlanShapeSpec.
  */
object FilterOps {

  val all: Seq[Q] = Seq(
    Q("b_filter_pred", (s, d) => {
      Io.table(s, d, "lineitem")
        .filter(col("l_quantity").between(5, 45) &&
          (col("l_discount") > 0.05 || col("l_tax") < 0.03))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_discount"), col("l_tax"))
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax")
    }, Some(
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
        |FROM lineitem
        |WHERE l_quantity BETWEEN 5 AND 45 AND (l_discount > 0.05 OR l_tax < 0.03)
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount, l_tax""".stripMargin)),

    Q("b_filter_in_between", (s, d) => {
      Io.table(s, d, "orders")
        .withColumn("o_date", col("o_orderdate").cast("date"))
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          col("o_date").between(lit("1996-01-01").cast("date"), lit("1997-12-31").cast("date")))
        .select(col("o_orderkey"), col("o_custkey"), col("o_date"),
          col("o_orderpriority"), col("o_totalprice"))
        .orderBy("o_orderkey")
    }, Some(
      """SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS o_date,
        |       o_orderpriority, o_totalprice
        |FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |  AND CAST(o_orderdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
        |ORDER BY o_orderkey""".stripMargin)),

    Q("b_filter_like_regex", (s, d) => {
      Io.table(s, d, "part")
        .filter(col("p_type").like("PROMO%") || col("p_name").rlike("[aeiou]{2}"))
        .select(col("p_partkey"), col("p_name"), col("p_type"))
        .orderBy("p_partkey")
    }, Some(
      """SELECT p_partkey, p_name, p_type
        |FROM part
        |WHERE p_type LIKE 'PROMO%' OR regexp_matches(p_name, '[aeiou]{2}')
        |ORDER BY p_partkey""".stripMargin)),

    // CASE WHEN banding + synthetic NULLs (the data has none): nullif /
    // coalesce / null-safe equality, cross-checked against DuckDB's
    // IS NOT DISTINCT FROM.
    Q("b_case_when_null", (s, d) => {
      Io.table(s, d, "customer")
        .withColumn("band",
          when(col("c_acctbal") < 0, "negative")
            .when(col("c_acctbal") < 3000, "low")
            .when(col("c_acctbal") < 7000, "mid")
            .otherwise("high"))
        .withColumn("seg_or_null", nullif(col("c_mktsegment"), lit("BUILDING")))
        .withColumn("seg_filled", coalesce(col("seg_or_null"), lit("(was-building)")))
        .withColumn("is_null_flag", col("seg_or_null").isNull)
        .withColumn("nse", col("seg_or_null") <=> lit("MACHINERY"))
        .select(col("c_custkey"), col("band"), col("seg_filled"),
          col("is_null_flag"), col("nse"))
        .orderBy("c_custkey")
    }, Some(
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'negative'
        |       WHEN c_acctbal < 3000 THEN 'low'
        |       WHEN c_acctbal < 7000 THEN 'mid'
        |       ELSE 'high' END AS band,
        |  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '(was-building)') AS seg_filled,
        |  NULLIF(c_mktsegment, 'BUILDING') IS NULL AS is_null_flag,
        |  NULLIF(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM 'MACHINERY' AS nse
        |FROM customer ORDER BY c_custkey""".stripMargin))
  )
}
