package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Jaccard similarity of two bitmask-encoded sets (array<long> of equal
  * length): popcount(AND) / popcount(OR), as an exact double ratio of
  * ints — identical to DuckDB's `len(list_intersect)/len(list_distinct)`
  * on the underlying sets.
  *
  * Pairs with the vocabulary-bitmask encoding in DedupOps: a set over a
  * vocabulary of V elements is ceil(V/64) longs, and the O(pairs)
  * similarity loop stays in whole-stage codegen (bit ops, no array
  * materialization) instead of interpreted list intersections.
  */
case class BitmaskJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "bitmask_jaccard"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmask_jaccard expects array<bigint> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toLongArray()
    val y = b.asInstanceOf[ArrayData].toLongArray()
    val n = math.min(x.length, y.length)
    var inter = 0L; var uni = 0L
    var i = 0
    while (i < n) {
      inter += java.lang.Long.bitCount(x(i) & y(i))
      uni += java.lang.Long.bitCount(x(i) | y(i))
      i += 1
    }
    if (uni == 0L) 0.0 else inter.toDouble / uni.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val inter = ctx.freshName("inter"); val uni = ctx.freshName("uni")
      s"""
         |long[] $x = $a.toLongArray();
         |long[] $y = $b.toLongArray();
         |int $n = Math.min($x.length, $y.length);
         |long $inter = 0L; long $uni = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $inter += java.lang.Long.bitCount($x[$i] & $y[$i]);
         |  $uni += java.lang.Long.bitCount($x[$i] | $y[$i]);
         |}
         |${ev.value} = ($uni == 0L) ? 0.0 : ((double) $inter) / ((double) $uni);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
