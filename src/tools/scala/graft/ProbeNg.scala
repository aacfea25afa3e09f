package graft

import graft.io.Io
import graft.ops.PairJoins
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-timing probe for the bigram-Jaccard pipeline (not part
  * of the contract). Usage: runMain graft.ProbeNg [sfDir]
  */
object ProbeNg {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.ExplodeNgrams.register(spark)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
      r
    }
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val bg = time("bg build+checkpoint") {
        Io.table(spark, sfDir, "documents")
          .repartition(spark.sparkContext.defaultParallelism)
          .select(col("doc_id"), col("lang"), expr("explode_ngrams(text, 2)").as("b"))
          .distinct()
          .localCheckpoint(true)
      }
      time("bg count")(bg.count())
      val vocab = time("vocab denseIds-ish") {
        bg.select(col("b")).distinct()
          .withColumn("bit", (pmod(xxhash64(col("b")), lit(32)) * 0).cast("int"))
          .localCheckpoint(true)
      }
      // real vocab path is private; approximate its cost with rank window
      val nWords = 16
      val vocab2 = time("vocab real-ish") {
        import org.apache.spark.sql.expressions.Window
        val buckets = 32
        val ranked = bg.select(col("b")).distinct()
          .withColumn("_bk", pmod(xxhash64(col("b")), lit(buckets)).cast("int"))
          .withColumn("_rn", row_number().over(
            Window.partitionBy(col("_bk")).orderBy(col("b"))))
        val offs = ranked.groupBy(col("_bk")).agg(count(lit(1)).as("_cnt"))
          .withColumn("_off", coalesce(sum(col("_cnt")).over(
            Window.orderBy(col("_bk")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("_bk"), col("_off"))
        ranked.join(broadcast(offs), "_bk")
          .withColumn("bit", (col("_off") + col("_rn") - 1).cast("int"))
          .drop("_bk", "_rn", "_off")
          .localCheckpoint(true)
      }
      val wordSums = (0 until nWords).map { w0 =>
        sum(when(expr(s"bit DIV 64 = $w0"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 64 AS INT))")).otherwise(0L)).as(s"m$w0")
      }
      val masks = time("masks build") {
        bg.join(broadcast(vocab2), "b")
          .groupBy(col("doc_id"), col("lang"))
          .agg(wordSums.head, wordSums.tail: _*)
          .select(col("doc_id"), col("lang"),
            array((0 until nWords).map(w0 => col(s"m$w0")): _*).as("mask"))
          .localCheckpoint(true)
      }
      time("masks count")(masks.count())
      for (b <- Seq(4, 8, 16)) {
        time(s"triangle B=$b") {
          PairJoins.trianglePairs(masks, Seq("lang"), "doc_id", b)
            .withColumn("j", expr("bitmask_jaccard(a.mask, b.mask)"))
            .filter(col("j") >= 0.3).count()
        }
      }
      val _ = (vocab, vocab2)
    }
    spark.stop()
  }
}
