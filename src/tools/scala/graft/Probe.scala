package graft

import graft.io.Io
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-timing probe for the MinHash pipeline (not part of the
  * contract). Usage: runMain graft.Probe [sfDir]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
      r
    }
    val numHashes = 64; val bands = 16; val rowsPerBand = numHashes / bands
    val t = Io.table(spark, sfDir, "documents")
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
    val sig = array((0 until numHashes).map { i =>
      array_min(transform(col("toks"), tk => xxhash64(concat(tk, lit("#" + i)))))
    }: _*)
    val bandHashes = array((0 until bands).map { b =>
      xxhash64(concat_ws(",",
        (0 until rowsPerBand).map(r => element_at(col("sig"), b * rowsPerBand + r + 1)): _*),
        lit(b))
    }: _*)
    val banded = t.withColumn("sig", sig)
      .select(col("doc_id"), posexplode(bandHashes).as(Seq("band", "bh")))
    time("signatures+banding")(banded.count())
    val aSide = banded.select(col("doc_id").as("doc_a"), col("band"), col("bh"))
    val bSide = banded.select(col("doc_id").as("doc_b"),
      col("band").as("band_b"), col("bh").as("bh_b"))
    val joined = aSide.join(bSide,
      col("band") === col("band_b") && col("bh") === col("bh_b") &&
        col("doc_a") < col("doc_b"))
    time("raw band collisions")(joined.count())
    val cand = joined.select(col("doc_a"), col("doc_b")).distinct()
    time("distinct candidates")(cand.count())
    time("full checked query")(Registry.queries("h_minhash_lsh_dedup")(spark, sfDir).count())
    spark.stop()
  }
}
