package graft.ops

import graft.io.Io
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import Q._

/** Data-quality rule engine — the validation pass an ETL workflow runs
  * before publishing a batch: row-local constraint checks (range,
  * positivity) and cross-table referential-integrity checks, all
  * reported as one (rule, n_checked, n_viol, viol_rate) table.
  *
  * Scale notes: every row-local rule family over a table is ONE scan —
  * the per-rule counters are parallel `sum(when(...))` aggregates that
  * partial-aggregate map-side, then the wide one-row result unpivots to
  * rule rows (driver-sized, not data-sized). Referential checks are
  * left joins against the distinct key set of the parent table —
  * at 100 TB the parent key sides here are dimension-sized
  * (broadcastable); a fact-fact FK check (lineitem→orders) shuffles
  * both sides once on the key, the standard co-partitioned layout.
  */
object DqOps {

  private def snap6(c: Column) = c.cast(DecimalType(38, 6)).cast("double")
  // VARCHAR hop: see AnalyticsOps.dSnap6 — replicates Spark's repr-based rounding
  private def dSnap6(x: String) =
    s"CAST(CAST(CAST(CASE WHEN ABS($x) < 5e-7 THEN CAST(0 AS DOUBLE) ELSE $x END" +
      s" AS VARCHAR) AS DECIMAL(38,6)) AS DOUBLE)"

  /** (rule name, violation predicate) → one counter pair per rule. */
  private def ruleAggs(rules: Seq[(String, Column)]): Seq[Column] =
    rules.flatMap { case (name, viol) =>
      Seq(count(lit(1)).as(s"${name}__n"),
        sum(when(viol, 1L).otherwise(0L)).as(s"${name}__v"))
    }

  /** Unpivot the one-row counter frame to (rule, n_checked, n_viol). */
  private def unpivotRules(df: DataFrame, rules: Seq[String]): DataFrame = {
    val stackArgs = rules.map(r => s"'$r', ${r}__n, ${r}__v").mkString(", ")
    df.select(expr(
      s"stack(${rules.size}, $stackArgs) AS (rule, n_checked, n_viol)"))
  }

  val all: Seq[Q] = Seq(

    // The full rule run: 4 row-local rules (2 that trip on this data,
    // 2 that hold) + 3 referential rules (one orphan-parent check that
    // trips). A DQ engine must report clean rules as confidently as
    // dirty ones — both outcomes are hash-checked.
    Q("e_dq_rules", (s, d) => {
      val li = Io.table(s, d, "lineitem")
      val ord = Io.table(s, d, "orders")
      val cust = Io.table(s, d, "customer")
      val liRules = Seq(
        "li_quantity_le_45" -> (col("l_quantity") > 45),
        "li_discount_le_8pct" -> (col("l_discount") > 0.08),
        "li_price_positive" -> (col("l_extendedprice") <= 0))
      val ordRules = Seq(
        "ord_price_positive" -> (col("o_totalprice") <= 0))
      val rowLocal =
        unpivotRules(li.agg(ruleAggs(liRules).head, ruleAggs(liRules).tail: _*),
          liRules.map(_._1))
          .union(unpivotRules(
            ord.agg(ruleAggs(ordRules).head, ruleAggs(ordRules).tail: _*),
            ordRules.map(_._1)))
      // Referential: child key must exist in parent (left join + null
      // count); parent must have ≥1 child (orders with no lineitem).
      def fkViolations(name: String, child: DataFrame, childKey: String,
          parentKeys: DataFrame, parentKey: String): DataFrame =
        child.join(parentKeys.withColumn("_hit", lit(1)),
            child(childKey) === parentKeys(parentKey), "left")
          .agg(count(lit(1)).as("n_checked"),
            sum(when(col("_hit").isNull, 1L).otherwise(0L)).as("n_viol"))
          .select(lit(name).as("rule"), col("n_checked"), col("n_viol"))
      val refRules =
        fkViolations("li_orderkey_fk", li, "l_orderkey",
            ord.select(col("o_orderkey")).distinct(), "o_orderkey")
          .union(fkViolations("ord_custkey_fk", ord, "o_custkey",
            cust.select(col("c_custkey")).distinct(), "c_custkey"))
          .union(fkViolations("ord_has_lineitem", ord, "o_orderkey",
            li.select(col("l_orderkey")).distinct(), "l_orderkey"))
      rowLocal.union(refRules)
        .select(col("rule"), col("n_checked"), col("n_viol"),
          snap6(col("n_viol") / col("n_checked")).as("viol_rate"))
        .orderBy("rule")
    }, Some(
      s"""WITH r AS (
         |  SELECT 'li_quantity_le_45' AS rule, COUNT(*) AS n_checked,
         |    SUM(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END) AS n_viol FROM lineitem
         |  UNION ALL SELECT 'li_discount_le_8pct', COUNT(*),
         |    SUM(CASE WHEN l_discount > 0.08 THEN 1 ELSE 0 END) FROM lineitem
         |  UNION ALL SELECT 'li_price_positive', COUNT(*),
         |    SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) FROM lineitem
         |  UNION ALL SELECT 'ord_price_positive', COUNT(*),
         |    SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) FROM orders
         |  UNION ALL SELECT 'li_orderkey_fk', COUNT(*),
         |    SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
         |    FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
         |      ON l.l_orderkey = o.o_orderkey
         |  UNION ALL SELECT 'ord_custkey_fk', COUNT(*),
         |    SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
         |    FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
         |      ON o.o_custkey = c.c_custkey
         |  UNION ALL SELECT 'ord_has_lineitem', COUNT(*),
         |    SUM(CASE WHEN l.l_orderkey IS NULL THEN 1 ELSE 0 END)
         |    FROM orders o LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem) l
         |      ON o.o_orderkey = l.l_orderkey)
         |SELECT rule, CAST(n_checked AS BIGINT) AS n_checked,
         |  CAST(n_viol AS BIGINT) AS n_viol,
         |  ${dSnap6("n_viol / CAST(n_checked AS DOUBLE)")} AS viol_rate
         |FROM r ORDER BY rule""".stripMargin)),

    // Quarantine split: the rows the rules reject, each tagged with the
    // sorted list of rules it violated — what lands in the dead-letter
    // table while the clean rows flow on. Pure map-side: every rule is
    // a row-local predicate evaluated in one scan; no shuffle except
    // the output ordering.
    Q("e_dq_quarantine", (s, d) => {
      val viol = array_sort(filter(array(
        when(col("l_quantity") > 45, lit("li_quantity_le_45")),
        when(col("l_discount") > 0.08, lit("li_discount_le_8pct")),
        when(col("l_tax") > 0.07, lit("li_tax_le_7pct"))),
        x => x.isNotNull))
      Io.table(s, d, "lineitem")
        .withColumn("violations", concat_ws(",", viol))
        .filter(col("violations") =!= "")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_discount"), col("l_tax"), col("violations"))
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
          "l_tax", "violations")
    }, Some(
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax,
        |  array_to_string(list_sort(list_filter([
        |    CASE WHEN l_quantity > 45 THEN 'li_quantity_le_45' END,
        |    CASE WHEN l_discount > 0.08 THEN 'li_discount_le_8pct' END,
        |    CASE WHEN l_tax > 0.07 THEN 'li_tax_le_7pct' END],
        |    x -> x IS NOT NULL)), ',') AS violations
        |FROM lineitem
        |WHERE l_quantity > 45 OR l_discount > 0.08 OR l_tax > 0.07
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount,
        |  l_tax, violations""".stripMargin)),

    // Join-key skew census — the pre-join diagnostic that decides
    // between a plain shuffle join, AQE skew split and manual salting
    // (c_join_skew_salted is the mitigation this report triggers).
    // Reports the 10 heaviest o_custkey values with their share and
    // ratio-to-mean, plus the domain-wide count CV. One per-key count
    // (map-side combined), one metadata-sized stats row broadcast back
    // onto the top keys; integer power sums run through DECIMAL(38,0)
    // because squared per-key counts sum past BIGINT at 100 TB.
    Q("e_skew_census", (s, d) => {
      import org.apache.spark.sql.types.DecimalType
      val c = Io.table(s, d, "orders")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
      val stats = c.agg(
        count(lit(1)).as("n_keys"),
        sum(col("cnt")).as("total"),
        sum(col("cnt").cast(DecimalType(38, 0)) * col("cnt").cast(DecimalType(38, 0)))
          .cast("double").as("sc2"))
        .withColumn("mean", col("total").cast("double") / col("n_keys"))
        .withColumn("cv",
          sqrt(col("sc2") / col("n_keys") - col("mean") * col("mean")) / col("mean"))
      c.orderBy(col("cnt").desc, col("o_custkey")).limit(10)
        .crossJoin(broadcast(stats))
        .select(col("o_custkey"), col("cnt"), col("n_keys"),
          snap6(col("cnt") / col("total").cast("double")).as("share"),
          snap6(col("cnt") / col("mean")).as("ratio_to_mean"),
          snap6(col("cv")).as("cv"))
        .orderBy(col("cnt").desc, col("o_custkey"))
    }, Some(
      s"""WITH c AS (
         |  SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY 1),
         |st AS (
         |  SELECT COUNT(*) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS total,
         |    CAST(SUM(CAST(cnt AS DECIMAL(38,0)) * CAST(cnt AS DECIMAL(38,0)))
         |         AS DOUBLE) AS sc2
         |  FROM c),
         |st2 AS (
         |  SELECT *, CAST(total AS DOUBLE) / n_keys AS mean FROM st),
         |top AS (
         |  SELECT o_custkey, cnt FROM c ORDER BY cnt DESC, o_custkey LIMIT 10)
         |SELECT t.o_custkey, t.cnt, s.n_keys,
         |  ${dSnap6("t.cnt / CAST(s.total AS DOUBLE)")} AS share,
         |  ${dSnap6("t.cnt / s.mean")} AS ratio_to_mean,
         |  ${dSnap6("SQRT(s.sc2 / s.n_keys - s.mean * s.mean) / s.mean")} AS cv
         |FROM top t CROSS JOIN st2 s
         |ORDER BY t.cnt DESC, t.o_custkey""".stripMargin)),

    // Benford first-digit census over o_totalprice — the fraud/synthetic
    // -data smoke test. The first significant digit comes from the
    // STRING form (first [1-9] character), never from log10 arithmetic
    // whose libm rounding can flip a power-of-ten boundary between
    // engines; the Benford expectations are shared double literals.
    // One scan + one 9-row aggregate; the chi-square statistic sums the
    // 9 per-digit terms through DECIMAL(38,6) and rides every row.
    Q("e_benford_digits", (s, d) => {
      val benford = Seq(
        1 -> 0.3010299956639812, 2 -> 0.17609125905568124,
        3 -> 0.12493873660829992, 4 -> 0.09691001300805642,
        5 -> 0.07918124604762482, 6 -> 0.06694678963061322,
        7 -> 0.05799194697768673, 8 -> 0.05115252244738129,
        9 -> 0.04575749056067514)
      val pb = benford.tail.foldLeft(
        when(col("digit") === benford.head._1, benford.head._2)) {
        case (acc, (dg, p)) => acc.when(col("digit") === dg, p)
      }
      // no-significant-digit guard (r12 sweep): a value of exactly 0
      // has no first digit in [1-9] — the empty extract would make the
      // INT cast RAISE on both engines (ANSI Spark and DuckDB alike).
      // Such rows land in a digit-0 bucket (NULL Benford expectation,
      // excluded from chi² by NULL propagation) — bucket 0 rather than
      // NULL so the ORDER BY digit row order stays engine-identical.
      val c = Io.table(s, d, "orders")
        .select(coalesce(
          when(regexp_extract(col("o_totalprice").cast("string"),
            "[1-9]", 0) =!= "",
            regexp_extract(col("o_totalprice").cast("string"), "[1-9]", 0)
              .cast("int")), lit(0)).as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
        .withColumn("p_benford", pb)
      val tot = c.agg(sum(col("n_obs")).as("n"))
      val terms = c.crossJoin(broadcast(tot))
        .withColumn("e", col("n") * col("p_benford"))
        .withColumn("term",
          (col("n_obs") - col("e")) * (col("n_obs") - col("e")) / col("e"))
      val chi2 = terms.agg(decSum(col("term")).as("chi2r"))
      terms.crossJoin(broadcast(chi2))
        .select(col("digit"), col("n_obs"),
          snap6(col("n_obs") / col("n").cast("double")).as("p_obs"),
          col("p_benford"), snap6(col("chi2r")).as("chi2"))
        .orderBy("digit")
    }, Some {
      val cases = Seq(
        1 -> "0.3010299956639812", 2 -> "0.17609125905568124",
        3 -> "0.12493873660829992", 4 -> "0.09691001300805642",
        5 -> "0.07918124604762482", 6 -> "0.06694678963061322",
        7 -> "0.05799194697768673", 8 -> "0.05115252244738129",
        9 -> "0.04575749056067514")
        .map { case (dg, p) => s"WHEN $dg THEN $p" }.mkString(" ")
      s"""WITH c AS (
         |  SELECT COALESCE(CAST(NULLIF(
         |      regexp_extract(CAST(o_totalprice AS VARCHAR), '[1-9]', 0), '')
         |              AS INT), 0) AS digit,
         |    COUNT(*) AS n_obs
         |  FROM orders GROUP BY 1),
         |-- cast: DuckDB types bare numeric literals DECIMAL, and the
         |-- decimal CASE result would drag the chi-square arithmetic
         |-- into overflowing DECIMAL(38) multiplies; Spark's lit() is
         |-- DOUBLE, and decimal->double rounds to the same nearest
         |-- double the literal parse produces.
         |cb AS (SELECT *, CAST(CASE digit $cases END AS DOUBLE) AS p_benford
         |       FROM c),
         |t AS (SELECT *, (SELECT CAST(SUM(n_obs) AS BIGINT) FROM c) AS n FROM cb),
         |tt AS (
         |  SELECT *,
         |    (n_obs - n * p_benford) * (n_obs - n * p_benford) / (n * p_benford)
         |      AS term
         |  FROM t),
         |x AS (SELECT ${dSum("term")} AS chi2r FROM tt)
         |SELECT digit, n_obs,
         |  ${dSnap6("n_obs / CAST(n AS DOUBLE)")} AS p_obs, p_benford,
         |  ${dSnap6("chi2r")} AS chi2
         |FROM tt CROSS JOIN x ORDER BY digit""".stripMargin
    }),

    // Referential-integrity census: per FK relation, child row count and
    // orphan count (child key with no parent row). Each relation is one
    // left join on the FK key + one global agg — at 100 TB the parent
    // key side is dimension-sized (broadcast) or shuffles on the key;
    // never more than one pass over each child table per relation.
    Q("e_fk_orphans", (s, d) => {
      def census(rel: String, child: DataFrame, key: String,
          parent: DataFrame, pkey: String): DataFrame =
        child.select(col(key))
          .join(parent.select(col(pkey).as(key)).distinct()
            .withColumn("hit", lit(1)), Seq(key), "left")
          .agg(count(lit(1)).as("n_child_rows"),
            sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_orphans"))
          .select(lit(rel).as("relation"), col("n_child_rows"), col("n_orphans"))
      val li = Io.table(s, d, "lineitem")
      census("lineitem->orders", li, "l_orderkey",
          Io.table(s, d, "orders"), "o_orderkey")
        .union(census("lineitem->part", li, "l_partkey",
          Io.table(s, d, "part"), "p_partkey"))
        .union(census("lineitem->supplier", li, "l_suppkey",
          Io.table(s, d, "supplier"), "s_suppkey"))
        .union(census("orders->customer", Io.table(s, d, "orders"),
          "o_custkey", Io.table(s, d, "customer"), "c_custkey"))
        .orderBy("relation")
    }, Some {
      def one(rel: String, child: String, key: String,
          parent: String, pkey: String) =
        s"""SELECT '$rel' AS relation, COUNT(*) AS n_child_rows,
           |  CAST(SUM(CASE WHEN p.$pkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_orphans
           |FROM $child c
           |LEFT JOIN (SELECT DISTINCT $pkey FROM $parent) p
           |  ON c.$key = p.$pkey""".stripMargin
      Seq(
        one("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        one("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
        one("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        one("orders->customer", "orders", "o_custkey", "customer", "c_custkey"))
        .mkString("\nUNION ALL\n") + "\nORDER BY relation"
    })
  )
}
