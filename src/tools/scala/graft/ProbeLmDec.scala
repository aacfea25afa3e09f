package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure the per-term DECIMAL(38,12) snap+sum cost inside an
  * LM-scoring-shaped aggregate (the h_ccnet_buckets / h_ngram_lm_score
  * hot loop) against the integer-picounit spine — decides whether the
  * family-wide oracle-text change is worth its equivalence re-proof.
  */
object ProbeLmDec {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.ExplodeNgrams.register(spark)
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val docBg = docs.select(col("doc_id"), col("lang"),
      expr("explode_ngrams(text, 2)").as("g"))
    val bg = docBg.groupBy("g").agg(count(lit(1)).as("c_ab"))
    println(s"bigram instances: ${docBg.count()}, distinct: ${bg.count()}")
    val dec12 = org.apache.spark.sql.types.DecimalType(38, 12)
    val lpRaw = log((col("c_ab") + 1).cast("double") / 100000.0)
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    for (i <- 1 to 3) {
      t(s"decimal12 snap+sum $i") {
        docBg.join(bg, "g")
          .groupBy(col("doc_id"), col("lang"))
          .agg((sum(lpRaw.cast(dec12)).cast("double") / count(lit(1)))
            .cast(org.apache.spark.sql.types.DecimalType(38, 6))
            .cast("double").as("lp")).count()
      }
      t(s"picounit long sum   $i") {
        docBg.join(bg, "g")
          .groupBy(col("doc_id"), col("lang"))
          .agg(((sum(floor(lpRaw * 1e12 + 0.5).cast("long")).cast("double") / 1e12)
            / count(lit(1)))
            .cast(org.apache.spark.sql.types.DecimalType(38, 6))
            .cast("double").as("lp")).count()
      }
    }
    spark.stop()
  }
}
