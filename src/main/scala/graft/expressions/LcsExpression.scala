package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Single-pass LCS kernel (object methods compile to static forwarders,
  * so generated code calls it directly — the [[NgramHash]] discipline).
  */
object LcsKernel {

  /** Length of the longest common subsequence of two token arrays —
    * the classic two-row DP, O(n·m) time / O(m) space, primitive int
    * rows, no allocation beyond the two rows. NULL elements match
    * nothing (tokens are never NULL in practice; the rule keeps the
    * kernel total). Token equality is exact UTF8String equality.
    */
  def lcs(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 || m == 0) return 0L
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      val ai = if (a.isNullAt(i - 1)) null else a.getUTF8String(i - 1)
      var j = 1
      while (j <= m) {
        val bj = if (b.isNullAt(j - 1)) null else b.getUTF8String(j - 1)
        cur(j) =
          if (ai != null && bj != null && ai.equals(bj)) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    prev(m).toLong
  }
}

/** Native token-LCS length of two ARRAY<STRING> columns — the kernel of
  * ROUGE-L ([[graft.operators.GenerationEval.rougeL]]). A higher-order-
  * function spelling of the O(n·m) DP would nest two interpreted folds
  * per row and fall out of whole-stage codegen; this expression emits
  * one static call to [[LcsKernel.lcs]] (primitive two-row DP), keeping
  * the generation-eval scan a pure codegen'd projection.
  *
  * Semantics: exact token equality, NULL elements match nothing,
  * mismatched lengths are fine (LCS is defined for any pair); a NULL
  * array yields NULL.
  */
case class LcsTokenLength(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"LcsTokenLength expects two ARRAY<STRING> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(leftValue: Any, rightValue: Any): Any =
    LcsKernel.lcs(leftValue.asInstanceOf[ArrayData],
      rightValue.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.LcsKernel.lcs($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
