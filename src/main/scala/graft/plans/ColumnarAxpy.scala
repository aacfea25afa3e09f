package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{ColumnarRule, ProjectExec, SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.vectorized.ColumnarBatch

import graft.functions.Axpy

/** The engine's vectorized (ColumnarBatch-level) extension point.
  *
  * Spark's parquet reader produces `ColumnarBatch`es; a normal
  * projection immediately crosses a ColumnarToRow transition and
  * evaluates row-at-a-time inside whole-stage codegen. For wide scans
  * feeding cheap arithmetic, the batch-level alternative — run the math
  * straight over the scan's column vectors, emit a new vector — skips
  * per-row virtual calls entirely and is the shape every columnar
  * accelerator (Gluten/Velox, RAPIDS) plugs in through this same
  * `injectColumnar` API. This rule is the in-repo proof of that
  * integration surface, on the JVM, for `axpy(x, a, b)`:
  *
  *  - `ColumnarAxpyRule.preColumnarTransitions` rewrites
  *    `Project [axpy(col, a, b)]` over a columnar child into
  *    [[AxpyColumnarExec]]; Spark's transition insertion then places
  *    the single ColumnarToRow ABOVE the math instead of below it.
  *  - [[AxpyColumnarExec]] maps each input batch to an output batch by
  *    one primitive loop over the input `ColumnVector` — identical IEEE
  *    arithmetic to the row path (`a * x + b`), so NativeFuncSpec can
  *    assert bit-equality between the two plans.
  *
  * Any shape the rule does not match still runs the complete row-based
  * [[graft.functions.Axpy]] expression — the rewrite is a pure
  * execution-strategy swap, never a semantics change.
  */
class ColumnarAxpyRule extends ColumnarRule {
  override def preColumnarTransitions: Rule[SparkPlan] = AxpyRewrite
}

object AxpyRewrite extends Rule[SparkPlan] {
  override def apply(plan: SparkPlan): SparkPlan = plan.transformUp {
    case p @ ProjectExec(
        Seq(al @ Alias(Axpy(attr: AttributeReference, a, b), _)), child)
        if child.supportsColumnar && a.foldable && b.foldable &&
          a.dataType == DoubleType && b.dataType == DoubleType =>
      val idx = child.output.indexWhere(_.exprId == attr.exprId)
      val (av, bv) = (a.eval(), b.eval())
      // a NULL coefficient must keep the row path (nullSafeEval returns
      // NULL per row; unboxing null would silently compute with 0.0 —
      // a semantics change, not a strategy swap)
      if (idx < 0 || av == null || bv == null) p
      else AxpyColumnarExec(
        av.asInstanceOf[Double], bv.asInstanceOf[Double],
        idx, p.output, child)
  }
}

case class AxpyColumnarExec(a: Double, b: Double, inputIdx: Int,
    override val output: Seq[Attribute], child: SparkPlan)
    extends UnaryExecNode {

  override def supportsColumnar: Boolean = true
  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] =
    throw new UnsupportedOperationException(
      "AxpyColumnarExec is columnar-only; Spark inserts ColumnarToRow above it")

  override protected def doExecuteColumnar(): RDD[ColumnarBatch] = {
    val (av, bv, idx) = (a, b, inputIdx)
    child.executeColumnar().mapPartitions { batches =>
      batches.map { batch =>
        val n = batch.numRows()
        val in = batch.column(idx)
        val out = new OnHeapColumnVector(n, DoubleType)
        var i = 0
        while (i < n) {
          if (in.isNullAt(i)) out.putNull(i)
          else out.putDouble(i, av * in.getDouble(i) + bv)
          i += 1
        }
        new ColumnarBatch(Array(out), n)
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
