package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derived-corpus generator for the scale-slope gate (r11 VERDICT item
  * 1): synthesizes an sf1-equivalent corpus (10× the sf0.1 bench
  * scale) from /root/testdata/sf0.1 so the heaviest rows can be
  * measured at two scales and gated on near-linear ratios — the one
  * empirical check plan pins can't provide.
  *
  * Scaling discipline (NOT naive row duplication):
  *  - every key domain is replicated with a per-replica offset of
  *    KeySpan (1e8), so FK joins stay consistent (scaled lineitem rows
  *    join exactly their replica's orders/part/supplier) and key-hash
  *    distributions stay realistic;
  *  - dimension tables region/nation copy verbatim (real dims don't
  *    grow with fact volume);
  *  - document TEXT is deterministically mutated per replica (~20% of
  *    words get a replica suffix, keyed by hash(word, rep)), so
  *    replicas are NOT near-duplicates of each other (pairwise shingle
  *    Jaccard ~0.06) — a naive 10× text copy would inflate every LSH
  *    bucket with quadratic replica-pair work and measure a corpus no
  *    natural 10× crawl resembles. Exact dups/near-dups WITHIN a
  *    replica survive (the same relative dup rate as sf0.1);
  *  - embeddings get a deterministic ±0.5% per-dimension perturbation
  *    (keyed by hash(vec_id, dim)) so replicas aren't coincident
  *    points.
  *
  * Timestamps are left unscaled: 10× data over the same calendar span
  * is how a larger deployment actually looks (denser days, same
  * windows).
  *
  * Usage: runMain graft.ScaleGen [srcDir] [outDir]
  *        defaults: /root/testdata/sf0.1 -> /tmp/graft-sf1
  */
object ScaleGen {
  val KeySpan = 100000000L // 1e8, far above any sf0.1 key
  val Reps = 10

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/graft-sf1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")

    // cross join with a 10-row replica spine, shift every key column
    def rep(df: DataFrame, keys: Seq[String]): DataFrame = {
      val spine = spark.range(Reps).select(col("id").as("_rep"))
      keys.foldLeft(df.crossJoin(spine)) { (d, k) =>
        d.withColumn(k, col(k) + col("_rep") * KeySpan)
      }
    }

    def write(df: DataFrame, name: String, parts: Int): Unit = {
      val t0 = System.nanoTime()
      df.drop("_rep").repartition(parts)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      val n = spark.read.parquet(s"$out/$name.parquet").count()
      println(f"[scalegen] $name%-10s $n%9d rows " +
        f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }

    // dims: verbatim
    write(t("region"), "region", 1)
    write(t("nation"), "nation", 1)

    write(rep(t("customer"), Seq("c_custkey")), "customer", 4)
    write(rep(t("supplier"), Seq("s_suppkey")), "supplier", 1)
    write(rep(t("part"), Seq("p_partkey")), "part", 4)
    write(rep(t("orders"), Seq("o_orderkey", "o_custkey")), "orders", 8)
    write(rep(t("lineitem"),
      Seq("l_orderkey", "l_partkey", "l_suppkey")), "lineitem", 32)
    write(rep(t("events"), Seq("event_id", "user_id")), "events", 8)

    // documents: key shift + deterministic per-replica word mutation
    val docs = rep(t("documents"), Seq("doc_id"))
      .withColumn("text", expr(
        """array_join(transform(split(text, ' '), w ->
          |  CASE WHEN _rep > 0 AND pmod(hash(w, _rep), 5) = 0
          |    THEN concat(w, 'x', CAST(_rep AS STRING)) ELSE w END), ' ')
          |""".stripMargin))
      .withColumn("n_chars", length(col("text")).cast("long"))
    write(docs, "documents", 8)

    // embeddings: key shift + deterministic per-dim perturbation
    val emb = rep(t("embeddings"), Seq("vec_id"))
      .withColumn("embedding", expr(
        """transform(embedding, (v, i) -> CAST(
          |  CAST(v AS DOUBLE) *
          |  (1.0D + CAST(pmod(hash(vec_id, i), 101) - 50 AS DOUBLE) / 1e4)
          |  AS FLOAT))""".stripMargin))
    write(emb, "embeddings", 4)

    spark.stop()
    println(s"[scalegen] done -> $out")
  }
}
