package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dev probe: where does the pcaScatter build spend its time?
  * Stages timed independently over the same long form: the self-join
  * alone, the (i,j) agg with plain double sums, and the full
  * decimal-snapped agg. Run: ProbePca <sfDir>. */
object ProbePca {
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
    val dec12 = DecimalType(38, 12)
    def long() = io.Io.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos0", "f")))
      .select(col("vec_id"), (col("pos0") + 1).as("i"),
        col("f").cast("double").as("x"))
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    t("long count")(long().count())
    val joined = long().as("a")
      .join(long().select(col("vec_id"), col("i").as("j"), col("x").as("y")), "vec_id")
    t("self-join count")(joined.count())
    t("agg plain double")(
      joined.groupBy(col("i"), col("j")).agg(sum(col("x") * col("y"))).count())
    t("agg decimal snap")(
      joined.groupBy(col("i"), col("j"))
        .agg(sum((col("x") * col("y")).cast(dec12))).count())
    t("agg decimal snap again")(
      joined.groupBy(col("i"), col("j"))
        .agg(sum((col("x") * col("y")).cast(dec12))).count())
    spark.stop()
  }
}
