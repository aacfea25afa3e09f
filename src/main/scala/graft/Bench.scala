package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up sweep: run every query once at the smallest SF first, so
    // the timed pass measures steady-state execution rather than
    // per-query Janino/JIT compilation (whole-stage codegen is cached by
    // generated source, so each query's operators must compile once).
    // Standard steady-state benchmarking; BASELINE.md documents it.
    val warmDir = "/root/testdata/sf0.001"
    val nQueries = SparkEntry.queries.size
    var warmed = 0
    var deadlineHit = false
    if (new java.io.File(warmDir).isDirectory) {
      // bounded: never let warm-up push the whole bench past a harness
      // timeout — un-warmed queries just pay their own compile once.
      // The sweep runs CONCURRENTLY (Spark schedules jobs from many
      // driver threads fine): warm-up only needs each query's generated
      // code compiled once, and at sf0.001 execution is trivial, so 8
      // in-flight queries overlap Janino compilation. The deadline is
      // sized per-query (deliberately generous — ~2.8 s/query at the
      // 213-query inventory): round 3's serial sweep AND round 5's flat
      // 240 s deadline both cut the sweep short as the inventory grew,
      // and the un-warmed tail paid Janino compile inside its timed
      // runs (t_q01/t_q03/t_q04 at ~4× their warmed cost in r5). The
      // warmed/deadline_hit counters land in target/bench_full.json so
      // a future regression separates compile tax from execution time
      // without forensics.
      val warmDeadline = System.nanoTime() +
        math.max(300L, nQueries * 3L) * 1000000000L
      val queue = new java.util.concurrent.ConcurrentLinkedQueue[
        (String, (SparkSession, String) => org.apache.spark.sql.DataFrame)]()
      // heaviest families first, so if the deadline cuts the sweep short
      // (shared noisy host) the queries that benefit most are warm
      SparkEntry.queries.toSeq
        .sortBy { case (n, _) =>
          (if (n.startsWith("h_") || n.startsWith("t_")) 0 else 1, n)
        }
        .foreach { case (n, fn) => queue.add((n, fn)) }
      val warmedCtr = new java.util.concurrent.atomic.AtomicInteger(0)
      val deadlineFlag = new java.util.concurrent.atomic.AtomicBoolean(false)
      val workers = (1 to 8).map { _ =>
        new Thread(() => {
          var next = queue.poll()
          while (next != null) {
            if (System.nanoTime() >= warmDeadline) {
              deadlineFlag.set(true)
              next = null
            } else {
              try next._2(spark, warmDir).count() catch { case _: Throwable => () }
              warmedCtr.incrementAndGet()
              next = queue.poll()
            }
          }
        })
      }
      workers.foreach(_.start())
      workers.foreach(_.join())
      warmed = warmedCtr.get()
      deadlineHit = deadlineFlag.get()
      System.err.println(
        s"[bench] warmed $warmed/$nQueries (deadline_hit=$deadlineHit)")
    } else {
      try {
        SparkEntry.queries.get("c_join_5way").foreach(_(spark, sfDir).count())
        SparkEntry.queries.get("e_win_rank").foreach(_(spark, sfDir).count())
      } catch { case _: Throwable => () }
    }
    // Settle before the timed pass: release the warm-up sweep's memoized
    // artifacts (their checkpoint blocks are dead weight the memo's
    // strong refs keep alive — measured as ~2× across-the-board timed
    // inflation in r5), drain garbage, and run one trivial job so the
    // first timed query (alphabetically a_count_star) doesn't absorb
    // post-warm-up GC/compilation residue — it has measured 1.7-2.0 s
    // for a 600k-row count in noisy runs.
    graft.ops.Q.releaseSession(spark)
    System.gc()
    try spark.range(1000).count() catch { case _: Throwable => () }
    // JVM-wide GC pause time, for per-query attribution: a timed query
    // whose wall time is mostly GC (r8 saw an 8.5 s young pause land on
    // one query) should be diagnosable from bench_full.json alone.
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val g0 = gcMillis()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      val gcSec = (gcMillis() - g0) / 1e3
      if (gcSec >= 0.5)
        System.err.println(f"[bench] $name%-24s $sec%8.2f s  (gc $gcSec%.1f s)")
      else
        System.err.println(f"[bench] $name%-24s $sec%8.2f s")
      (name, sec, gcSec)
    }.map { case (n, s, g) => (n, s, g) }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val gcs = results.filter(_._3 >= 0.1)
      .map { case (k, _, g) => s"\"" + k + "\":" + g }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val totalGc = results.map(_._3).sum
    // Full per-query map goes to a file artifact (the driver's stdout
    // tail is bounded — a 175-entry map on stdout pushed earlier lines
    // out of its capture window in r1/r2 and truncated itself in r4);
    // stdout keeps only the short parseable headline line below.
    try {
      val dir = java.nio.file.Paths.get("target")
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.write(dir.resolve("bench_full.json"),
        (s"""{"metric":"per_query","queries":$qs,"sf":"$sfDir",""" +
          s""""warmed":$warmed,"n_queries":$nQueries,""" +
          s""""gc_sec":$gcs,"gc_total_sec":$totalGc,""" +
          s""""deadline_hit":$deadlineHit}""")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Throwable => () }
    val headline = Seq("t_q01", "t_q05", "t_q18", "c_join_5way",
      "h_minhash_lsh_dedup", "h_cosine_topk", "h_ngram_jaccard", "g_session_30m")
    val hq = results.filter { case (k, _, _) => headline.contains(k) }
      .map { case (k, v, _) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    // "headline" (not "queries"): this line carries only 8 spotlight
    // timings — the full map is the per_query line above. A distinct key
    // keeps any consumer from mistaking the subset for the whole.
    println(s"""{"metric":"total","value":$total,"unit":"sec","headline":$hq,"sf":"$sfDir"}""")
    spark.stop()
  }
}
