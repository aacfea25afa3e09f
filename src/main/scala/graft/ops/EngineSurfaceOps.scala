package graft.ops

import graft.io.Io
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SQL-surface staples a user switching engines would reach for on day
  * one: URL parsing, mode(), argmax (max_by / max-of-struct), and the
  * correlated LATERAL join. Each is either DataFrame-API with a DuckDB
  * relational twin, or ONE shared SQL text run verbatim by both engines
  * (the TpchOps discipline).
  *
  * Scale notes: everything here is scan-parallel or one hash-shuffle on
  * the grouping key; the lateral top-k decorrelates to a windowed
  * row_number — no per-row subquery execution at 100 TB.
  */
object EngineSurfaceOps {

  private def shared(name: String, sql: String): Q =
    Q(name, (s: SparkSession, d: String) => { Io.views(s, d); s.sql(sql) }, Some(sql))

  /** exact order-independent mean / Σv² of events.value at 1e-6 — one
    * text both engines run verbatim (f_sql_script_iter). */
  private val meanExpr =
    "CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) " +
      "AS DECIMAL(38,6)) AS DOUBLE)"
  private val m2Expr =
    "CAST(CAST(CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) " +
      "AS DECIMAL(38,6)) AS DOUBLE)"

  val all: Seq[Q] = Seq(

    // GROUP BY ALL (group keys inferred from the non-aggregate select
    // items) — the exploratory-SQL staple both engines accept as the
    // SAME text; the plan is the ordinary partial+final hash aggregate.
    shared("f_group_by_all",
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ALL ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // Lateral column alias: a select item referencing a sibling alias
    // of the SAME select list (no subquery nesting) — one shared text;
    // both derivations stay in the scan's projection.
    shared("f_lateral_alias",
      """SELECT o_orderkey, o_totalprice * 0.9 AS discounted,
        |  discounted * 0.07 AS tax
        |FROM orders WHERE o_orderkey <= 200
        |ORDER BY o_orderkey""".stripMargin),

    // Aggregate FILTER clause (SQL:2003 T612) — per-aggregate
    // predicates without CASE-wrapping, one shared text; both engines
    // plan it as conditional accumulation inside the ordinary
    // partial+final hash aggregate (no extra pass, no expand).
    shared("f_agg_filter_clause",
      """SELECT l_returnflag,
        |  COUNT(*) AS n,
        |  COUNT(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6)))
        |    FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS qty_disc,
        |  COUNT(*) FILTER (WHERE l_tax = 0) AS n_notax
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // parse_url / url_encode / url_decode. The URL is built from part
    // columns ('#' in p_brand forces percent-encoding), then parsed back:
    // HOST and PATH extraction, a named QUERY parameter, and a decode
    // round-trip that must return the original brand. DuckDB lacks the
    // url functions; its twin states the equivalent string algebra
    // (constrained input: '#' is the only character needing encoding).
    Q("f_url_funcs", (s, d) => {
      Io.table(s, d, "part")
        .withColumn("u", concat(
          lit("https://catalog.example.com/parts/"), col("p_partkey"),
          lit("?brand="), expr("url_encode(p_brand)"),
          lit("&size="), col("p_size")))
        .select(col("p_partkey"),
          expr("parse_url(u, 'HOST')").as("host"),
          expr("parse_url(u, 'PATH')").as("path"),
          expr("parse_url(u, 'QUERY', 'brand')").as("brand_enc"),
          expr("url_decode(parse_url(u, 'QUERY', 'brand'))").as("brand_rt"),
          expr("parse_url(u, 'QUERY', 'size')").as("size_q"))
        .orderBy("p_partkey")
    }, Some(
      """SELECT p_partkey,
        |  'catalog.example.com' AS host,
        |  '/parts/' || CAST(p_partkey AS VARCHAR) AS path,
        |  REPLACE(p_brand, '#', '%23') AS brand_enc,
        |  p_brand AS brand_rt,
        |  CAST(p_size AS VARCHAR) AS size_q
        |FROM part ORDER BY p_partkey""".stripMargin)),

    // mode() aggregate, ONE shared SQL text. l_linenumber's mode is
    // structurally unique (every order contributes linenumber 1, strictly
    // fewer contribute 2+), so both engines' tie policies are irrelevant
    // and the value is deterministic at every scale factor.
    shared("d_agg_mode",
      """SELECT l_returnflag,
        |  CAST(mode(l_linenumber) AS INT) AS mode_ln,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin),

    // Argmax family: max_by/min_by and the max-of-struct idiom (the
    // classic "row with the group's max" without a self-join — one
    // hash aggregate, no shuffle beyond the groupBy). The comparison
    // key embeds o_orderkey so ties on price are totally ordered; the
    // price is an untouched parquet double (no arithmetic → exact).
    Q("d_agg_argmax", (s, d) => {
      val top = max(struct(col("o_totalprice"), col("o_orderkey")))
      Io.table(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          top.getField("o_orderkey").as("top_order"),
          top.getField("o_totalprice").as("top_price"),
          expr("max_by(o_custkey, struct(o_totalprice, o_orderkey))").as("top_cust"),
          expr("min_by(o_custkey, struct(o_totalprice, o_orderkey))").as("bottom_cust"))
        .orderBy("o_orderpriority")
    }, Some(
      """WITH r AS (
        |  SELECT o_orderpriority, o_orderkey, o_custkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn_max,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn_min
        |  FROM orders)
        |SELECT o_orderpriority,
        |  MAX(CASE WHEN rn_max = 1 THEN o_orderkey END) AS top_order,
        |  MAX(CASE WHEN rn_max = 1 THEN o_totalprice END) AS top_price,
        |  MAX(CASE WHEN rn_max = 1 THEN o_custkey END) AS top_cust,
        |  MAX(CASE WHEN rn_min = 1 THEN o_custkey END) AS bottom_cust
        |FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Correlated LATERAL join (top-2 orders per sampled customer), ONE
    // shared SQL text. Catalyst decorrelates the LIMIT-under-correlation
    // into a windowed row_number filter — verified in PlanShapeSpec; at
    // 100 TB this is one shuffle on o_custkey, never a per-row subquery.
    shared("f_lateral_join",
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice
        |  FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey DESC
        |  LIMIT 2) t
        |WHERE c.c_custkey % 20 = 0
        |ORDER BY c.c_custkey, t.o_orderkey""".stripMargin),

    // Recursive CTE (Spark 4.x WITH RECURSIVE), ONE shared SQL text:
    // a 91-day date spine generated by linear recursion, left-joined
    // against orders so empty days surface as zero — the calendar-fill
    // shape (g_resample_gapfill covers the sequence() spelling; this
    // row pins the recursive-query surface itself). Recursion depth is
    // bounded by the constant date range (91 < Spark's default
    // recursion level limit of 100), and each step is a one-row
    // increment — the recursion generates a TINY spine table; the
    // data-sized side joins it once by date. Both engines execute the
    // identical text.
    shared("f_recursive_cte",
      """WITH RECURSIVE spine(day) AS (
        |  SELECT DATE '1996-01-01'
        |  UNION ALL
        |  SELECT CAST(day + INTERVAL '1' DAY AS DATE) FROM spine
        |  WHERE day < DATE '1996-03-31')
        |SELECT s.day, COUNT(o.o_orderkey) AS n_orders
        |FROM spine s LEFT JOIN orders o ON CAST(o.o_orderdate AS DATE) = s.day
        |GROUP BY s.day ORDER BY s.day""".stripMargin),

    // unionByName(allowMissingColumns): schema-evolution-tolerant
    // union — two extracts with DIFFERENT column orders and one
    // one-sided column combine by NAME, the missing side null-filled.
    // Positional UNION (f_set_union) would silently mis-align these;
    // by-name is what multi-generation pipeline outputs actually need.
    // DuckDB twin: UNION ALL BY NAME, its native spelling of the same
    // semantics. Scale: no shuffle at all — union is plan glue.
    Q("f_union_by_name", (s, d) => {
      val a = Io.table(s, d, "orders").filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val b = Io.table(s, d, "orders").filter(col("o_orderkey") % 2 === 1)
        .select(col("o_totalprice"), col("o_orderkey"))
      a.unionByName(b, allowMissingColumns = true)
        .orderBy("o_orderkey")
    }, Some(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders WHERE o_orderkey % 2 = 0
        |UNION ALL BY NAME
        |SELECT o_totalprice, o_orderkey
        |FROM orders WHERE o_orderkey % 2 = 1
        |ORDER BY o_orderkey""".stripMargin)),

    // Parameterized SQL (Spark 4.x named parameter markers): the query
    // text carries :cutoff / :status placeholders bound at execution —
    // the injection-safe templating surface applications use instead of
    // string concatenation. The oracle runs the same text with the
    // literals inlined (DuckDB's python API binds positionally; the
    // CHECKED quantity is the result, the Spark side pins the binding
    // API itself).
    // mask() (Spark 3.4+): format-preserving PII redaction as a native
    // expression — uppercase→X, lowercase→x, digit→n — next to a sha2
    // pseudonym for joinability; the pair is the standard "analyst
    // view" of a PII column (h_pii_scrub handles free-text patterns;
    // this is the typed-column surface). DuckDB twin: the three
    // character-class regexp passes in an order where no pass touches
    // another's output. Map-side scan at any scale.
    Q("f_mask_pii", (s, d) => {
      Io.views(s, d)
      s.sql(
        """SELECT c_custkey, mask(c_name) AS name_masked,
          |  mask(c_name, 'U', 'l', '#') AS name_masked_custom,
          |  substr(sha2(c_name, 256), 1, 16) AS name_token
          |FROM customer ORDER BY c_custkey LIMIT 200""".stripMargin)
    }, Some(
      """SELECT c_custkey,
        |  regexp_replace(regexp_replace(regexp_replace(c_name,
        |    '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
        |    AS name_masked,
        |  regexp_replace(regexp_replace(regexp_replace(c_name,
        |    '[A-Z]', 'U', 'g'), '[a-z]', 'l', 'g'), '[0-9]', '#', 'g')
        |    AS name_masked_custom,
        |  substr(sha256(c_name), 1, 16) AS name_token
        |FROM customer ORDER BY c_custkey LIMIT 200""".stripMargin)),

    // LISTAGG ... WITHIN GROUP (Spark 4.x / ISO SQL:2016): ordered
    // string aggregation as a native aggregate — the report-building
    // surface that previously needed collect_list + array_sort +
    // concat_ws. The WITHIN GROUP order carries a unique tiebreak so
    // both engines emit the identical string (DuckDB twin: STRING_AGG
    // with ORDER BY).
    Q("f_listagg", (s, d) => {
      Io.views(s, d)
      s.sql(
        """SELECT r_name,
          |  LISTAGG(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations,
          |  COUNT(*) AS n
          |FROM nation JOIN region ON n_regionkey = r_regionkey
          |GROUP BY r_name ORDER BY r_name""".stripMargin)
    }, Some(
      """SELECT r_name,
        |  STRING_AGG(n_name, ',' ORDER BY n_name) AS nations,
        |  COUNT(*) AS n
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    // IDENTIFIER() clause (Spark 4.x): table and column names supplied
    // as PARAMETERS instead of string-spliced SQL — the injection-safe
    // templating surface a multi-tenant pipeline uses to run one audited
    // query text over many tables. The identifier is resolved at
    // analysis time, so the plan is identical to the literal form (the
    // oracle is exactly that literal form). Map-side scan + one agg.
    Q("f_identifier_clause", (s, d) => {
      Io.views(s, d)
      s.sql(
        """SELECT l_returnflag, COUNT(*) AS n,
          |  CAST(SUM(CAST(IDENTIFIER(:qtycol) AS DECIMAL(38,6))) AS DOUBLE)
          |    AS total_qty
          |FROM IDENTIFIER(:tbl)
          |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
        Map("tbl" -> "lineitem", "qtycol" -> "l_quantity"))
    }, Some(
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
        |    AS total_qty
        |FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Catalog DDL inside the graded gate (r13): publish a managed table
    // (saveAsTable through the warehouse), define a PERSISTENT view over
    // it (stored query text, not a temp view), and aggregate through the
    // view BY NAME — the second-session surface CatalogSpec exercises,
    // here with a DuckDB oracle on the equivalent direct derivation.
    // Names are corpus-hashed so SFs never collide in a shared session;
    // CREATE OR REPLACE + overwrite keep the row idempotent. At 100 TB
    // the table write is the one data-sized stage (a filtered subset);
    // the view is metadata and the final agg is one keyed hash agg.
    Q("f_catalog_ddl", (s, d) => {
      val sfx = java.lang.Long.toHexString(d.hashCode.toLong & 0xffffffffL)
      val tbl = s"ord_urgent_$sfx"
      // the in-memory catalog forgets tables across JVMs but the
      // warehouse directory survives — an orphaned location blocks
      // CREATE (LOCATION_ALREADY_EXISTS), so drop metadata AND reclaim
      // the dir before publishing (what a real retention job does)
      s.sql(s"DROP VIEW IF EXISTS v_$tbl")
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      val wh = s.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:")
      val loc = java.nio.file.Paths.get(wh, tbl)
      if (java.nio.file.Files.isDirectory(loc)) {
        val st = java.nio.file.Files.walk(loc)
        try {
          val it = st.sorted(java.util.Comparator.reverseOrder()).iterator()
          while (it.hasNext) java.nio.file.Files.delete(it.next())
        } finally st.close()
      }
      Io.table(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .write.mode("overwrite").saveAsTable(tbl)
      s.sql(s"CREATE OR REPLACE VIEW v_$tbl AS " +
        s"SELECT o_orderstatus, o_totalprice FROM $tbl")
      s.sql(
        s"""SELECT o_orderstatus, COUNT(*) AS n,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
           |FROM v_$tbl
           |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    }, Some(
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // VARIANT (Spark 4 semi-structured type): parse once into the
    // binary variant encoding, then typed-path extraction with
    // variant_get / try_variant_get — the open-schema JSON story at
    // 100 TB, where parsing each path separately (get_json_object xN)
    // re-tokenizes the document N times but a variant parses ONCE and
    // each extraction is a cheap binary probe. The checked contract
    // builds a nested doc (object + array) from events rows with plain
    // string concat — byte-identical SQL on both engines — and
    // aggregates typed extractions; the DuckDB twin runs json_extract
    // over the same constructed text. try_variant_get on a missing
    // path must yield NULL (counted as 0), matching JSON-null algebra.
    // Map-side parse + one grouping shuffle; no UDF, codegen'd.
    Q("f_variant_json", (s, d) => {
      val k = get_json_object(col("props"), "$.k").cast("int")
      Io.events(s, d)
        .withColumn("j", concat(
          lit("{\"a\":"), k.cast("string"),
          lit(",\"nested\":{\"b\":"), (k * 2).cast("string"),
          lit("},\"tags\":[\"x\",\""), col("event_type"), lit("\"]}")))
        .select(col("event_type"), parse_json(col("j")).as("v"))
        .select(col("event_type"),
          expr("variant_get(v, '$.a', 'int')").as("a"),
          expr("variant_get(v, '$.nested.b', 'int')").as("b"),
          expr("variant_get(v, '$.tags[1]', 'string')").as("tag"),
          expr("try_variant_get(v, '$.missing', 'int')").as("m"))
        .groupBy(col("event_type"))
        .agg(sum(col("a")).as("sum_a"), sum(col("b")).as("sum_b"),
          count(col("m")).as("n_missing"),
          count(when(col("tag") === col("event_type"), 1)).as("n_tag_match"))
        .orderBy("event_type")
    }, Some(
      """WITH j AS (
        |  SELECT event_type,
        |    '{"a":' || CAST(CAST(json_extract_string(props, '$.k') AS INT) AS VARCHAR)
        |    || ',"nested":{"b":' || CAST(CAST(json_extract_string(props, '$.k') AS INT) * 2 AS VARCHAR)
        |    || '},"tags":["x","' || event_type || '"]}' AS doc
        |  FROM events)
        |SELECT event_type,
        |  CAST(SUM(CAST(json_extract_string(doc, '$.a') AS INT)) AS BIGINT) AS sum_a,
        |  CAST(SUM(CAST(json_extract_string(doc, '$.nested.b') AS INT)) AS BIGINT) AS sum_b,
        |  COUNT(json_extract_string(doc, '$.missing')) AS n_missing,
        |  COUNT(CASE WHEN json_extract_string(doc, '$.tags[1]') = event_type THEN 1 END) AS n_tag_match
        |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // SQL-defined functions (Spark 4 CREATE FUNCTION ... RETURN expr):
    // reusable business logic registered IN the engine, not smeared as
    // client-side expression copies — and COMPOSABLE (charge calls
    // net). Catalyst inlines the bodies at plan time, so the executed
    // plan is the same scan + hash agg as the open-coded expression:
    // zero per-row interpretation cost at 100 TB, unlike a JVM/Python
    // UDF. Per-row arithmetic is pure double (IEEE-identical in both
    // engines — the t_q01 expression class); sums snapped through the
    // shared decimal discipline.
    Q("f_sql_udf", (s, d) => {
      Io.views(s, d)
      s.sql("CREATE OR REPLACE TEMPORARY FUNCTION graft_net(p DOUBLE, disc DOUBLE) " +
        "RETURNS DOUBLE RETURN p * (1.0 - disc)")
      s.sql("CREATE OR REPLACE TEMPORARY FUNCTION graft_charge(p DOUBLE, disc DOUBLE, tax DOUBLE) " +
        "RETURNS DOUBLE RETURN graft_net(p, disc) * (1.0 + tax)")
      s.sql(
        """SELECT l_returnflag, COUNT(*) AS n,
          |  ROUND(CAST(SUM(CAST(graft_net(l_extendedprice, l_discount) AS DECIMAL(38,6))) AS DOUBLE), 4) AS revenue,
          |  ROUND(CAST(SUM(CAST(graft_charge(l_extendedprice, l_discount, l_tax) AS DECIMAL(38,6))) AS DOUBLE), 4) AS charged
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    }, Some(
      """SELECT l_returnflag, COUNT(*) AS n,
        |  ROUND(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE), 4) AS revenue,
        |  ROUND(CAST(SUM(CAST((l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax) AS DECIMAL(38,6))) AS DOUBLE), 4) AS charged
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    Q("f_parameterized_sql", (s, d) => {
      Io.views(s, d)
      s.sql(
        """SELECT o_orderpriority, COUNT(*) AS n,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
          |FROM orders
          |WHERE o_totalprice >= :cutoff AND o_orderstatus = :status
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
        Map("cutoff" -> 50000.0, "status" -> "F"))
    }, Some(
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
        |FROM orders
        |WHERE o_totalprice >= 50000.0 AND o_orderstatus = 'F'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // COLLATION (Spark 4.x collated string type): case-insensitive
    // equality/prefix semantics declared IN THE TYPE (collate(x,
    // 'UTF8_LCASE')) instead of smeared lower() calls — the engine can
    // then push collation-aware comparisons into hash keys and joins.
    // DuckDB has no Spark collation names; its twin states the
    // equivalent lower()-normalized algebra, which for UTF8_LCASE on
    // ASCII data is exact. Checked: binary vs lcase equality against
    // an upper-cased twin and a collated prefix test. Map-side only.
    Q("f_collation", (s, d) => {
      Io.views(s, d)
      s.sql(
        """SELECT p_partkey,
          |  p_name = upper(p_name) AS eq_binary,
          |  collate(p_name, 'UTF8_LCASE') = collate(upper(p_name), 'UTF8_LCASE')
          |    AS eq_lcase,
          |  startswith(collate(upper(p_name), 'UTF8_LCASE'),
          |             collate(substring(p_name, 1, 3), 'UTF8_LCASE'))
          |    AS prefix_lcase
          |FROM part WHERE p_partkey <= 200
          |ORDER BY p_partkey""".stripMargin)
    }, Some(
      """SELECT p_partkey,
        |  p_name = upper(p_name) AS eq_binary,
        |  lower(p_name) = lower(upper(p_name)) AS eq_lcase,
        |  starts_with(lower(upper(p_name)), lower(substring(p_name, 1, 3)))
        |    AS prefix_lcase
        |FROM part WHERE p_partkey <= 200
        |ORDER BY p_partkey""".stripMargin)),

    // XML ingestion (from_xml, Spark 4.x; plus the classic xpath_*
    // family): parse an XML payload into a typed struct and extract
    // the same fields by XPath — the third semi-structured format next
    // to JSON (f_json_*) and VARIANT (f_variant_funcs). DuckDB has no
    // XML functions; its twin extracts the identical values with
    // regexes, exact on this constrained payload (values contain no
    // markup). The payload is BUILT from part columns so the check is
    // data-driven. Pure row-local projection at any scale.
    Q("f_xml_funcs", (s, d) => {
      Io.views(s, d)
      s.sql(
        """WITH x AS (
          |  SELECT p_partkey,
          |    concat('<r><k>', CAST(p_partkey AS STRING), '</k><n>', p_name,
          |           '</n><sz>', CAST(p_size AS STRING), '</sz></r>') AS xml
          |  FROM part WHERE p_partkey <= 200)
          |SELECT p_partkey,
          |  from_xml(xml, 'k INT, n STRING, sz INT').k AS xk,
          |  from_xml(xml, 'k INT, n STRING, sz INT').n AS xn,
          |  xpath_int(xml, '/r/sz') AS xsz,
          |  xpath_string(xml, '/r/n') AS xn2
          |FROM x ORDER BY p_partkey""".stripMargin)
    }, Some(
      """WITH x AS (
        |  SELECT p_partkey,
        |    concat('<r><k>', CAST(p_partkey AS VARCHAR), '</k><n>', p_name,
        |           '</n><sz>', CAST(p_size AS VARCHAR), '</sz></r>') AS xml
        |  FROM part WHERE p_partkey <= 200)
        |SELECT p_partkey,
        |  CAST(regexp_extract(xml, '<k>([^<]*)</k>', 1) AS INT) AS xk,
        |  regexp_extract(xml, '<n>([^<]*)</n>', 1) AS xn,
        |  CAST(regexp_extract(xml, '<sz>([^<]*)</sz>', 1) AS INT) AS xsz,
        |  regexp_extract(xml, '<n>([^<]*)</n>', 1) AS xn2
        |FROM x ORDER BY p_partkey""".stripMargin)),

    // SQL SCRIPTING (Spark 4.x BEGIN…END procedural blocks): a WHILE
    // loop iterating a data-dependent fixed point — 3 rounds of
    // 2-sigma trimmed mean over events.value, each round recomputing
    // mean/σ from the rows inside the previous round's bounds. This is
    // the migration surface for warehouse stored procedures; the
    // control flow lives in the ENGINE (script-local variables,
    // scalar-subquery assignment), not in driver-side Scala. The
    // DuckDB twin unrolls the same 3 rounds as CTEs, so the loop's
    // arithmetic is oracle-checked: mean and Σv² snap to DECIMAL(38,6)
    // each round (exact order-independent sums underneath), σ =
    // SQRT(...) is correctly-rounded IEEE on both engines, and the
    // bounds chain mean ∓ 2σ is written in the same association order.
    // Scale: each round is one scan + global aggregate (map-side
    // combined); the script only ever holds scalars.
    Q("f_sql_script_iter", (s, d) => {
      Io.views(s, d)
      s.conf.set("spark.sql.scripting.enabled", "true")
      s.sql(
        s"""BEGIN
           |  DECLARE lo DOUBLE DEFAULT -1e308;
           |  DECLARE hi DOUBLE DEFAULT 1e308;
           |  DECLARE mean DOUBLE DEFAULT 0;
           |  DECLARE m2 DOUBLE DEFAULT 0;
           |  DECLARE sigma DOUBLE DEFAULT 0;
           |  DECLARE i INT DEFAULT 0;
           |  WHILE i < 3 DO
           |    -- one scan per round (r15): mean and m2 come from the
           |    -- SAME aggregate via tuple assignment — the old form's
           |    -- two scalar subqueries each ran a full events scan
           |    SET (mean, m2) = (SELECT $meanExpr, $m2Expr FROM events
           |                      WHERE value >= lo AND value <= hi);
           |    SET sigma = SQRT(GREATEST(m2 - mean * mean, 0));
           |    SET lo = mean - 2 * sigma;
           |    SET hi = mean + 2 * sigma;
           |    SET i = i + 1;
           |  END WHILE;
           |  SELECT
           |    (SELECT COUNT(*) FROM events
           |     WHERE value >= lo AND value <= hi) AS n_kept,
           |    CAST(CAST(mean AS DECIMAL(38,6)) AS DOUBLE) AS trimmed_mean,
           |    CAST(CAST(sigma AS DECIMAL(38,6)) AS DOUBLE) AS trimmed_sigma;
           |END""".stripMargin)
    }, Some {
      val round = (k: Int, src: String) =>
        s"""r$k AS (SELECT $meanExpr AS mean, $m2Expr AS m2 FROM $src),
           |b$k AS (SELECT mean, SQRT(GREATEST(m2 - mean * mean, 0)) AS sigma
           |        FROM r$k),
           |w$k AS (SELECT mean - 2 * sigma AS lo, mean + 2 * sigma AS hi,
           |               mean, sigma FROM b$k)""".stripMargin
      s"""WITH ${round(1, "events")},
         |${round(2, "events, w1 WHERE value >= w1.lo AND value <= w1.hi")},
         |${round(3, "events, w2 WHERE value >= w2.lo AND value <= w2.hi")}
         |SELECT
         |  (SELECT COUNT(*) FROM events, w3
         |   WHERE value >= w3.lo AND value <= w3.hi) AS n_kept,
         |  CAST(CAST(w3.mean AS DECIMAL(38,6)) AS DOUBLE) AS trimmed_mean,
         |  CAST(CAST(w3.sigma AS DECIMAL(38,6)) AS DOUBLE) AS trimmed_sigma
         |FROM w3""".stripMargin
    }),

    // VARIANT ingestion (Spark 4.x semi-structured type): parse the
    // JSON props column once into VARIANT, extract a typed path, and
    // aggregate — the open-schema ingestion pattern for logs whose
    // fields drift (vs f_json_schema's fixed-schema from_json). The
    // DuckDB twin extracts the same path with its JSON functions; the
    // checked quantity is the typed values, not the storage format.
    // Scale: parse_json is scan-parallel row-local work; the aggregate
    // is one hash shuffle on event_type.
    Q("f_variant_funcs", (s, d) => {
      Io.views(s, d)
      s.sql(
        """SELECT event_type,
          |  CAST(SUM(variant_get(parse_json(props), '$.k', 'int')) AS BIGINT) AS sum_k,
          |  COUNT(CASE WHEN variant_get(parse_json(props), '$.k', 'int') > 50
          |             THEN 1 END) AS n_big
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    }, Some(
      """SELECT event_type,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |  COUNT(CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) > 50
        |             THEN 1 END) AS n_big
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Display-formatting surface (report/export layer): grouped-digit
    // number formatting, zero-padded fixed-width ids, and pattern
    // date formatting. Inputs are kept INTEGER/date so the row checks
    // the formatting codecs, not float shortest-repr differences
    // (format_number on doubles rounds half-even from the binary
    // value — a cross-engine trap this row deliberately avoids).
    // Map-side scalar expressions.
    Q("f_format_funcs", (s, d) => {
      Io.views(s, d)
      s.sql(
        """SELECT o_orderkey,
          |  format_number(o_orderkey * 1000, 0) AS grouped,
          |  format_string('%08d', o_orderkey) AS padded,
          |  date_format(o_orderdate, 'yyyy-MM-dd') AS d_iso,
          |  date_format(o_orderdate, 'yyyy/MM') AS d_ym
          |FROM orders WHERE o_orderkey <= 200
          |ORDER BY o_orderkey""".stripMargin)
    }, Some(
      """SELECT o_orderkey,
        |  format('{:,}', o_orderkey * 1000) AS grouped,
        |  printf('%08d', o_orderkey) AS padded,
        |  strftime(o_orderdate, '%Y-%m-%d') AS d_iso,
        |  strftime(o_orderdate, '%Y/%m') AS d_ym
        |FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""".stripMargin)),

    // Column-level encryption round-trip (aes_encrypt/aes_decrypt,
    // GCM): the at-rest protection surface a governed lakehouse pairs
    // with mask()/k-anonymity. GCM output is IV-randomized, so the
    // CIPHERTEXT is not oracle-checkable; the checked contract is the
    // round-trip itself — decrypt(encrypt(x)) must give back exactly
    // the source column (emitted and hash-matched against the raw
    // oracle values) plus the deterministic ciphertext length. ECB
    // would be checkable but is the wrong cipher to showcase; length +
    // exact round-trip pins the codec without weakening the crypto.
    // Map-side scalar expressions — scan-parallel at any scale.
    Q("f_aes_roundtrip", (s, d) => {
      Io.views(s, d)
      s.sql(
        """SELECT c_custkey,
          |  CAST(aes_decrypt(
          |    aes_encrypt(CAST(c_name AS BINARY), '0123456789abcdef0123456789abcdef'),
          |    '0123456789abcdef0123456789abcdef') AS STRING) AS name_rt,
          |  length(aes_encrypt(CAST(c_name AS BINARY),
          |    '0123456789abcdef0123456789abcdef')) - length(c_name)
          |    AS cipher_overhead
          |FROM customer WHERE c_custkey <= 100
          |ORDER BY c_custkey""".stripMargin)
    }, Some(
      """SELECT c_custkey, c_name AS name_rt,
        |  28 AS cipher_overhead
        |FROM customer WHERE c_custkey <= 100 ORDER BY c_custkey""".stripMargin)),

    // SQL pipe syntax (Spark 4.x `|>` operators, SIGMOD'24 "Pipe
    // Syntax in SQL"): the same logical plan as a nested SELECT but
    // written as a linear transform chain — purely a parser surface,
    // so the oracle is the equivalent classic SQL and the plan (one
    // scan + partial/final hash agg + sort) is identical. The sum
    // keeps the decSum discipline (exact decimal, order-independent).
    Q("f_pipe_syntax", (s, d) => {
      Io.views(s, d)
      s.sql(
        """FROM lineitem
          ||> WHERE l_quantity > 10
          ||> AGGREGATE COUNT(*) AS n_rows,
          |     CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
          |   GROUP BY l_returnflag
          ||> ORDER BY l_returnflag""".stripMargin)
    }, Some(
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem WHERE l_quantity > 10
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))
  )
}
