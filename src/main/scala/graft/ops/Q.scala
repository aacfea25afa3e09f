package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One declared operator: a `SparkEntry.queries` entry plus (usually) a
  * DuckDB oracle SQL twin. `oracle == None` → the driver records a weaker
  * rows-only check (reserved for ops whose hash family DuckDB lacks).
  *
  * Every checked query obeys the parity rules of SURVEY.md §2 (R1-R5):
  * total-order ORDER BY with a unique tiebreak, order-independent decimal
  * sums for double aggregates, event time only as epoch-microsecond
  * BIGINT, dates as DATE, similarity rounded at 1e-6.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {

  /** Exact, accumulation-order-independent sum of a double column: cast
    * each value to DECIMAL(38,6) (deterministic round-to-nearest), sum
    * exactly, cast back to double. This removes Spark's run-to-run
    * partial-aggregate merge-order nondeterminism (SURVEY §0.1 G7) and
    * makes the value bit-identical to DuckDB's
    * `CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)`. Scales: partial
    * aggregation (map-side combine) still applies — decimal sums merge
    * associatively, so the plan shape at 100 TB is identical to a plain
    * sum.
    */
  def decSum(c: Column): Column = sum(c.cast(DecimalType(38, 6))).cast("double")

  /** Order-independent mean via exact sum / count. */
  def decAvg(c: Column): Column = decSum(c) / count(lit(1))

  def r4(c: Column): Column = round(c, 4)
  def r6(c: Column): Column = round(c, 6)

  /** DuckDB text twins for the helpers above. */
  def dSum(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(38,6))) AS DOUBLE)"
  def dAvg(x: String): String = s"(${dSum(x)} / COUNT(*))"

  /** Session-scoped memo for pipeline-shared materialized intermediates
    * (doc token masks, near-dup cluster labels): several checked queries
    * consume the same derived table, and a production pipeline
    * materializes such artifacts once, not once per downstream consumer.
    * Keyed by (session, input dir, artifact name); values are already
    * materialized (localCheckpoint'ed) DataFrames, so a hit costs
    * nothing and re-runs nothing. Entries die with their SparkSession
    * (weak keys would need the session; a simple synchronized map is
    * fine — the value count is O(#artifacts × #dirs), single digits).
    * Thread-safe: computeIfAbsent guards concurrent warm-up sweeps.
    */
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, String), DataFrame]
  def memoized(s: SparkSession, dir: String, name: String)
      (build: => DataFrame): DataFrame = {
    // NOT computeIfAbsent: artifacts nest (the CC labels build consumes
    // the memoized pair table), and a nested computeIfAbsent on the
    // same map throws IllegalStateException("Recursive update"). Plain
    // get / build / putIfAbsent allows the nesting; a concurrent
    // warm-up may rarely build the same artifact twice, which is
    // wasteful but correct (first put wins, both values are equivalent
    // materialized tables).
    val k = (System.identityHashCode(s), dir, name)
    val hit = memo.get(k)
    if (hit != null) hit
    else {
      val v = build
      val prev = memo.putIfAbsent(k, v)
      if (prev != null) prev else v
    }
  }
}
