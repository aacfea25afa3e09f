package graft

import graft.io.Io
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: diff the CC edge set derived from the minhash pair table
  * against the direct all-pairs contracted-node join. */
object ProbeCc {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.MinHashSig.register(spark)
    // rebuild docMasks-equivalent (single-long masks)
    val tok = Io.table(spark, d, "documents")
      .select(col("doc_id"), col("lang"),
        explode(array_distinct(split(col("text"), " "))).as("token"))
    val vocabArr = tok.agg(sort_array(collect_set(col("token"))).as("varr"))
    val masks = tok.crossJoin(broadcast(vocabArr))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(expr(
        "shiftleft(CAST(1 AS BIGINT), CAST(array_position(varr, token) AS INT) - 1)"))
        .as("mask"))
      .localCheckpoint(true)
    val nodes = masks.groupBy(col("lang"), col("mask"))
      .agg(min(col("doc_id")).as("nid")).localCheckpoint(true)
    println(s"nodes=${nodes.count()}")
    val a = nodes.select(col("nid").as("na"), col("lang"), col("mask").as("ma"))
    val b = nodes.select(col("nid").as("nb"), col("lang").as("lang_b"), col("mask").as("mb"))
    val direct = a.join(b, col("lang") === col("lang_b") && col("na") < col("nb"))
      .filter(expr("bit_count(ma & mb)") / expr("bit_count(ma | mb)") >= 0.9)
      .select(col("na"), col("nb")).localCheckpoint(true)
    println(s"direct node pairs=${direct.count()}")
    val fromPairs = graft.Registry.queries("h_jaccard_pairs")(spark, d)
      .select(col("doc_a").as("na"), col("doc_b").as("nb"))
      .join(nodes.select(col("nid").as("na")), "na")
      .join(nodes.select(col("nid").as("nb")), "nb")
      .select(col("na"), col("nb")).localCheckpoint(true)
    println(s"from pair table=${fromPairs.count()}")
    val missing = direct.except(fromPairs)
    println(s"missing=${missing.count()}")
    missing.limit(5).collect().foreach(println)
    val extra = fromPairs.except(direct)
    println(s"extra=${extra.count()}")
    spark.stop()
  }
}
