package graft
import org.apache.spark.sql.SparkSession
object ProbeChain {
  def main(args: Array[String]): Unit = {
    // args: [dataRoot] [cpus] — dev probe, but portable like Bench:
    // the data root and parallelism come from args/env, not hardcoded.
    val dataRoot = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_DATA_ROOT", "/root/testdata"))
    val cpus = args.lift(1).getOrElse(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-34s ${(System.nanoTime()-t0)/1e9}%6.2f s  rows=$n")
    }
    // warm codegen at sf0.001 (fresh memo keys there)
    for (q <- Seq("h_dedup_best", "h_jaccard_pairs", "h_minhash_lsh_dedup", "h_incremental_dedup"))
      SparkEntry.queries(q)(spark, s"$dataRoot/sf0.001").count()
    // timed chain at sf0.1, bench order
    for (q <- Seq("h_dedup_best", "h_dedup_clusters", "h_incremental_dedup",
        "h_jaccard_pairs", "h_minhash_lsh_dedup"))
      t(q) { SparkEntry.queries(q)(spark, s"$dataRoot/sf0.1").count() }
    spark.stop()
  }
}
