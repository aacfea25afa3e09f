package graft

import graft.io.Io
import graft.ops.Q
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scratch stage-timing probe for g_bootstrap_ci (not part of the
  * contract): isolates explode vs coin vs decimal-sum cost.
  */
object ProbeBoot {
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
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[boot] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }
    val orders = Io.table(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    time("base count")(orders.count())
    val base = orders.repartition(col("o_orderkey"))
      .withColumn("h", expr(Q.coin("o_orderkey")).cast("long"))
    time("coin only")(base.agg(sum(col("h"))).collect()(0))
    val rep = base
      .select(col("o_totalprice"), col("h"),
        explode(sequence(lit(0), lit(99))).as("rep"))
    time("explode count")(rep.count())
    val keep = rep.withColumn("keep",
      (col("h") * (col("rep") * 2 + 1) + col("rep")) % 4294967296L
        >= 2147483648L)
    time("keep agg long")(keep.groupBy(col("rep"))
      .agg(sum(when(col("keep"), 1L).otherwise(0L))).count())
    time("keep agg decimal")(keep.groupBy(col("rep"))
      .agg(sum(when(col("keep"), col("o_totalprice"))
        .cast(DecimalType(38, 6)))).count())
    time("keep agg double")(keep.groupBy(col("rep"))
      .agg(sum(when(col("keep"), col("o_totalprice")))).count())
    val means = keep.groupBy(col("rep"))
      .agg((sum(when(col("keep"), col("o_totalprice")).cast(
          DecimalType(38, 6)))
        .cast("double") /
        sum(when(col("keep"), 1L).otherwise(0L))).as("m"))
    time("means count")(means.count())
    val wcd = org.apache.spark.sql.expressions.Window.orderBy(col("m"))
    val cd = means.withColumn("cd", cume_dist().over(wcd))
    time("cd count")(cd.count())
    val lo = cd.filter(col("cd") >= 0.025).agg(min(col("m")).as("ci_lo"))
    time("cd filter count")(cd.filter(col("cd") >= 0.025).count())
    time("cd filter agg cnt")(cd.filter(col("cd") >= 0.025).agg(count(col("m"))).collect()(0))
    time("cd agg min no filter")(cd.agg(min(col("m"))).collect()(0))
    time("lo collect")(lo.collect()(0))
    time("lo collect 2")(lo.collect()(0))
    time("lo collect 3")(lo.collect()(0))
    val hi = cd.filter(col("cd") >= 0.975).agg(min(col("m")).as("ci_hi"))
    time("hi collect")(hi.collect()(0))
    val point = orders.agg(count(lit(1)).as("n_orders"))
    time("assembled")(point.crossJoin(broadcast(lo)).crossJoin(broadcast(hi)).count())
    // collect(), not count(): count() lets Catalyst prune the decimal
    // aggregates the probe exists to measure (the probe-lies failure
    // mode in SKILL.md — 0.5 s by count vs 25 s real)
    time("full query")(Registry.queries("g_bootstrap_ci")(spark, sfDir).collect())
    spark.stop()
  }
}
