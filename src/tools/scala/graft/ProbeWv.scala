package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage volumes of the wide-vocab dedup pipeline. */
object ProbeWv {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.functions.ExplodeNgrams.register(spark)
    graft.functions.NgramSetMask.register(spark)
    graft.functions.MinHashSig.register(spark)
    val docs = graft.io.Io.table(spark, d, "documents")
      .repartition(spark.sparkContext.defaultParallelism)
    val vocabRow = docs.select(expr("explode_ngrams(text, 2)").as("b"))
      .agg(sort_array(collect_set(col("b"))).as("varr")).localCheckpoint(true)
    val nW = math.max(1, (vocabRow.select(size(col("varr"))).head.getInt(0) + 63) / 64)
    println(s"nWords=$nW")
    val masks = docs.crossJoin(broadcast(vocabRow))
      .select(col("doc_id"), expr(s"ngram_set_mask(text, varr, 2, $nW)").as("mask"))
      .filter(expr("exists(mask, x -> x != 0)"))
      .localCheckpoint(true)
    def tt(n: String)(f: => Long): Unit = { val t0 = System.nanoTime(); val r = f; println(f"$n%-28s ${(System.nanoTime()-t0)/1e9}%6.2f s  rows=$r") }
    tt("masks")(masks.count())
    val nodeIds = masks.groupBy(col("mask")).agg(min(col("doc_id")).as("nid"))
      .localCheckpoint(true)
    tt("nodes")(nodeIds.count())
    val toksC = split(col("text"), " ")
    val bgArr = array_distinct(when(size(toksC) >= 2,
      transform(sequence(lit(1), size(toksC) - 1),
        i => concat(element_at(toksC, i), lit(" "), element_at(toksC, i + 1))))
      .otherwise(array().cast("array<string>")))
    val t = graft.io.Io.table(spark, d, "documents").select(col("doc_id"), bgArr.as("bg"))
    val numHashes = 64; val bands = 16; val rowsPerBand = 4
    val bandHashes = array((0 until bands).map { b =>
      xxhash64(concat_ws(",",
        (0 until rowsPerBand).map(r => element_at(col("sig"), b * rowsPerBand + r + 1)): _*),
        lit(b))
    }: _*)
    val reps = nodeIds.join(t, nodeIds("nid") === t("doc_id"))
      .withColumn("sig", expr(s"minhash_sig(bg, $numHashes)"))
      .select(col("nid"), col("mask"), posexplode(bandHashes).as(Seq("band", "bh")))
      .localCheckpoint(true)
    tt("reps+sig")(reps.count())
    val a = reps.select(col("nid").as("na"), col("band"), col("bh"))
    val b = reps.select(col("nid").as("nb"), col("band").as("b2"), col("bh").as("bh2"))
    val coll = a.join(b, col("band") === col("b2") && col("bh") === col("bh2") && col("na") < col("nb"))
    tt("collisions")(coll.count())
    tt("cand distinct")(coll.select("na", "nb").distinct().count())
    tt("full query")(SparkEntry.queries("h_minhash_widevocab")(spark, d).count())
    tt("full query warm")(SparkEntry.queries("h_minhash_widevocab")(spark, d).count())
    spark.stop()
  }
}
