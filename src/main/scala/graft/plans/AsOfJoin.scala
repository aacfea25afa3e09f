package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join: for every left row, the single right row with the
  * greatest `rightTs <= leftTs` and equal key (inner semantics).
  *
  * This is the engine's one whole-operator extension (SURVEY §2-C
  * `c_join_asof` ships the composed range-join+window form; this node is
  * the single-pass physical alternative): both sides hash-cluster on the
  * key and sort by (key, ts), then one streaming merge pass joins them —
  * no row multiplication, no window state. At 100 TB the cost is exactly
  * one shuffle per side plus a linear merge, versus the composed form's
  * range-join fanout. Keys and timestamps are LongType (the engine's
  * canonical epoch-micros event time, G2).
  */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    toleranceUs: Long) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoin =
    copy(left = l, right = r)
}

case class AsOfJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    toleranceUs: Long,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKey; val rk = rightKey; val lt = leftTs; val rt = rightTs
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lProj = UnsafeProjection.create(Seq(lk, lt), lOut)
      val rProj = UnsafeProjection.create(Seq(rk, rt), rOut)
      val joined = new JoinedRow
      // downstream operators require UnsafeRow — project the joined pair
      val outProj = UnsafeProjection.create(lOut ++ rOut, lOut ++ rOut)
      var rValid = false // an unconsumed right row is buffered
      var rKeyV = 0L; var rTsV = 0L
      var rCur: InternalRow = null
      var candValid = false // best match so far for the current key
      var candKey = 0L
      var candTs = 0L
      var cand: InternalRow = null

      def advanceRight(lkV: Long, ltV: Long): Unit = {
        var done = false
        while (!done && (rValid || rIter.hasNext)) {
          if (!rValid) {
            val r = rIter.next()
            val kt = rProj(r)
            rKeyV = kt.getLong(0); rTsV = kt.getLong(1)
            rCur = r.copy()
            rValid = true
          }
          if (rKeyV < lkV || (rKeyV == lkV && rTsV <= ltV)) {
            if (rKeyV == lkV) { cand = rCur; candKey = rKeyV; candTs = rTsV; candValid = true }
            rValid = false // consumed
          } else done = true
        }
      }

      lIter.flatMap { lRow =>
        val kt = lProj(lRow)
        val lkV = kt.getLong(0); val ltV = kt.getLong(1)
        advanceRight(lkV, ltV)
        // tolerance: the best candidate must also be RECENT enough —
        // the pandas merge_asof contract (stale quotes never match).
        if (candValid && candKey == lkV && ltV - candTs <= toleranceUs)
          Iterator.single[InternalRow](outProj(joined(lRow, cand)))
        else Iterator.empty
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfJoinExec =
    copy(left = l, right = r)
}

/** Planner strategy mapping the logical node to the physical merge join.
  * Registered via `spark.experimental.extraStrategies` (public API) or
  * GraftExtensions.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tol) =>
      AsOfJoinExec(lk, rk, lt, rt, tol, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** User-facing API. Column names must be disjoint across the two sides
  * (rename before joining, as with any self-join).
  */
object AsOf {
  def join(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      toleranceUs: Long = Long.MaxValue): DataFrame = {
    val spark: SparkSession = leftDf.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val lp = leftDf.queryExecution.analyzed
    val rp = rightDf.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${p.output.map(_.name)}"))
    GraftBridge.ofRows(spark,
      AsOfJoin(lp, rp, attr(lp, leftKey), attr(rp, rightKey),
        attr(lp, leftTs), attr(rp, rightTs), toleranceUs))
  }
}
