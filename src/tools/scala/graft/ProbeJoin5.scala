package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan

/** c_join_5way bimodality probe (r13 VERDICT item 1b): the row read
  * 3.77 s vs its 0.79 s anchor on the driver host across three samples
  * while idle hosts read 0.79-1.50 s, and its cross-round history
  * (0.63-6.12 s) is chronically bimodal. Hypotheses: (a) AQE flips a
  * dim broadcast to SMJ under memory pressure, (b) broadcast build
  * stalls, (c) plain host contention. This probe runs the row N times
  * in one JVM and prints, per run: wall, GC delta, the executed plan's
  * join census, and the broadcast exchanges' collect/build/broadcast
  * metric totals — if slow runs show the SAME plan and flat broadcast
  * times, the excess is host time, not a plan flip.
  * Usage: runMain graft.ProbeJoin5 [sfDir] [nRuns]
  */
object ProbeJoin5 {
  private def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      a +: nodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      q +: nodes(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      // no recursion: the reused subtree exists at its original site too
      Seq(r)
    case o => o +: o.children.flatMap(nodes)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    }
    var lastSig = ""
    for (i <- 1 to n) {
      val g0 = gcMs()
      val t0 = System.nanoTime()
      val agg = SparkEntry.queries("c_join_5way")(spark, sfDir)
        .groupBy().count()
      agg.collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val gc = gcMs() - g0
      val ns = nodes(agg.queryExecution.executedPlan)
      val joins = ns.map(_.nodeName).filter(_.contains("Join"))
        .groupBy(identity).toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k x${v.size}" }.mkString("; ")
      val bcast = ns.collect {
        case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
          Seq("collectTime", "buildTime", "broadcastTime")
            .flatMap(k => b.metrics.get(k).map(_.value)).sum
      }.sum
      val flip = if (joins != lastSig && lastSig.nonEmpty) "  <-- PLAN CHANGED" else ""
      lastSig = joins
      println(f"[probe5] run $i%2d  $sec%6.2f s  gc ${gc}%4d ms  " +
        f"bcast ${bcast}%5d ms  [$joins]$flip")
    }
    spark.stop()
  }
}
