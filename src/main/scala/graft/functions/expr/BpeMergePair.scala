package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd BPE merge application (Sennrich et al. 2016): rewrite a
  * symbol sequence by replacing every adjacent `(left, right)` pair
  * with the concatenated symbol, GREEDY LEFT-TO-RIGHT and
  * non-overlapping — `[a,a,a]` under merge `(a,a)` becomes `[aa,a]`,
  * never `[a,aa]`, and the consumed position cannot seed the next match
  * (the reference implementation's scan rule). One O(n) primitive pass
  * per row; the composable alternative (an `aggregate` HOF building an
  * array accumulator) evaluates interpreted per vocabulary row inside
  * the training loop's hottest projection, the exact HOF-in-hot-path
  * class the repo's kernel discipline exists to avoid.
  *
  * Inputs are ROW data plus two per-iteration literals; no foldability
  * requirement — the pair operands are tiny strings, re-planned fresh
  * each merge iteration.
  *
  * Registered as SQL function `bpe_merge(syms, left, right)` by
  * [[graft.GraftExtensions]]; auto-swept by KernelAudit. */
case class BpeMergePair(syms: Expression, leftSym: Expression,
                        rightSym: Expression) extends TernaryExpression {

  override def first: Expression = syms
  override def second: Expression = leftSym
  override def third: Expression = rightSym

  override def checkInputDataTypes(): TypeCheckResult =
    (syms.dataType, leftSym.dataType, rightSym.dataType) match {
      case (ArrayType(StringType, _), StringType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        "bpe_merge requires (array<string>, string, string), " +
          s"got (${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "bpe_merge"

  /** The scan shared by interpreted eval and the generated code. */
  def merge(xs: ArrayData, l: UTF8String, r: UTF8String): GenericArrayData = {
    val n = xs.numElements()
    val out = new Array[AnyRef](n)
    var o = 0
    var i = 0
    while (i < n) {
      val cur = xs.getUTF8String(i)
      if (i + 1 < n && cur != null && cur.equals(l)) {
        val nxt = xs.getUTF8String(i + 1)
        if (nxt != null && nxt.equals(r)) {
          out(o) = UTF8String.concat(cur, nxt)
          o += 1
          i += 2 // consumed — non-overlapping left-to-right
        } else {
          out(o) = cur; o += 1; i += 1
        }
      } else {
        out(o) = cur; o += 1; i += 1
      }
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, o))
  }

  override def nullSafeEval(xs: Any, l: Any, r: Any): Any =
    merge(xs.asInstanceOf[ArrayData],
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bpeMerge", this, classOf[BpeMergePair].getName)
    nullSafeCodeGen(ctx, ev,
      (xs, l, r) => s"${ev.value} = $self.merge($xs, $l, $r);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(syms = newFirst, leftSym = newSecond, rightSym = newThird)
}
