package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarial micro-corpus generator for the degenerate-slice
  * robustness sweep (r11 VERDICT item 2): three corpora derived from
  * sf0.001, each targeting the NaN/div-0/empty-group latent class that
  * was previously found one finding at a time (sMAPE 0/0, p_base = 0):
  *
  *  - `single`: ONE row in every fact table (FK-consistent: one
  *    lineitem, its order/part/supplier, that order's customer; one
  *    event, one document, one embedding). Single-row groups: n−1 = 0
  *    variances, empty lag windows, one-point fits, 1-row percentiles.
  *  - `zero`: sf0.001 row sets with every numeric measure zeroed
  *    (quantities, prices, balances, event values, embedding vectors).
  *    0/0 rates, zero-norm cosines, log(0) guards, zero-variance
  *    slopes.
  *  - `empty`: sf0.001 with whole SLICES emptied — lineitem has zero
  *    rows, events has no 'purchase' rows, documents are single-lang,
  *    embeddings single-label. Empty joins, empty conversion
  *    denominators, empty per-group percentile inputs.
  *
  * The sweep (tools/degen_sweep.py) then runs every checked query on
  * BOTH engines over each corpus and asserts no divergence — both
  * engines must agree on values (NaN = NaN), emptiness, or error.
  *
  * Usage: runMain graft.DegenGen [srcDir] [outRoot]
  *        defaults: /root/testdata/sf0.001 -> /tmp/graft-degen
  */
object DegenGen {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = if (args.length > 1) args(1) else "/tmp/graft-degen"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, out)
    spark.stop()
    println(s"[degen] done -> $out")
  }

  /** Writes the three corpora under `out` (callable from
    * DegenerateSweepSpec with the shared test session). */
  def generate(spark: SparkSession, src: String, out: String): Unit = {
    def t(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")
    def w(df: DataFrame, corpus: String, name: String): Unit =
      df.coalesce(1).write.mode("overwrite")
        .parquet(s"$out/$corpus/$name.parquet")

    // ---- single: one FK-consistent row per fact table
    {
      val li1 = t("lineitem").orderBy("l_orderkey", "l_linenumber",
        "l_partkey", "l_suppkey").limit(1).cache()
      val Array(ok, pk, sk) = li1
        .select("l_orderkey", "l_partkey", "l_suppkey")
        .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
      val o1 = t("orders").filter(col("o_orderkey") === ok).limit(1).cache()
      val ck = o1.select("o_custkey").collect()(0).getLong(0)
      w(t("region"), "single", "region")
      w(t("nation"), "single", "nation")
      w(t("customer").filter(col("c_custkey") === ck).limit(1),
        "single", "customer")
      w(t("supplier").filter(col("s_suppkey") === sk).limit(1),
        "single", "supplier")
      w(t("part").filter(col("p_partkey") === pk).limit(1), "single", "part")
      w(o1, "single", "orders")
      w(li1, "single", "lineitem")
      w(t("events").orderBy("event_id").limit(1), "single", "events")
      w(t("documents").orderBy("doc_id").limit(1), "single", "documents")
      w(t("embeddings").orderBy("vec_id").limit(1), "single", "embeddings")
      println("[degen] single written")
    }

    // ---- zero: every numeric measure zeroed, structure intact
    {
      w(t("region"), "zero", "region")
      w(t("nation"), "zero", "nation")
      w(t("customer").withColumn("c_acctbal", lit(0.0)), "zero", "customer")
      w(t("supplier").withColumn("s_acctbal", lit(0.0)), "zero", "supplier")
      w(t("part").withColumn("p_retailprice", lit(0.0)), "zero", "part")
      w(t("orders").withColumn("o_totalprice", lit(0.0)), "zero", "orders")
      w(t("lineitem")
        .withColumn("l_quantity", lit(0.0))
        .withColumn("l_extendedprice", lit(0.0))
        .withColumn("l_discount", lit(0.0))
        .withColumn("l_tax", lit(0.0)), "zero", "lineitem")
      w(t("events").withColumn("value", lit(0.0)), "zero", "events")
      w(t("documents"), "zero", "documents")
      w(t("embeddings").withColumn("embedding",
        expr("transform(embedding, v -> CAST(0.0 AS FLOAT))")),
        "zero", "embeddings")
      println("[degen] zero written")
    }

    // ---- empty: whole slices emptied
    {
      w(t("region"), "empty", "region")
      w(t("nation"), "empty", "nation")
      w(t("customer"), "empty", "customer")
      w(t("supplier"), "empty", "supplier")
      w(t("part"), "empty", "part")
      w(t("orders"), "empty", "orders")
      w(t("lineitem").filter(lit(false)), "empty", "lineitem")
      w(t("events").filter(col("event_type") =!= "purchase"),
        "empty", "events")
      w(t("documents").filter(col("lang") === "en"), "empty", "documents")
      val minLabel = t("embeddings").agg(min(col("label"))).collect()(0).getInt(0)
      w(t("embeddings").filter(col("label") === minLabel),
        "empty", "embeddings")
      println("[degen] empty written")
    }
  }
}
