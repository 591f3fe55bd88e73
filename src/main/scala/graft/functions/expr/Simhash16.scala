package graft.functions.expr

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 16-bit SimHash of a word array in ONE pass over raw UTF-8 bytes.
  *
  * Bit-identical to the composable form in
  * [[graft.functions.TextFunctions.withSimhash16]] (and the DuckDB
  * oracle): bit j uses the top bit of hex digit j of md5(word) — here
  * read directly as the top bit of nibble j of the digest, with tf-signed
  * accumulation. The composable form needs a materialized md5 array plus
  * 16 interpreted folds; this expression is one digest per word.
  *
  * Registered as SQL function `simhash16` by [[graft.GraftExtensions]].
  */
case class Simhash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash16 requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash16"

  override def nullSafeEval(a: Any): Any =
    Simhash16.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.Simhash16.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Simhash16 {
  private val md = ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): Long = {
    val sums = new Array[Int](16)
    val digestFn = md.get()
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (arr.isNullAt(i)) {
        // null word: the composable form's `when(substr(md5(null)..) >= '8')`
        // is null -> otherwise branch -> -1 on every bit; match it exactly
        var j = 0
        while (j < 16) { sums(j) -= 1; j += 1 }
      } else {
        digestFn.reset()
        val digest = digestFn.digest(arr.getUTF8String(i).getBytes)
        var j = 0
        while (j < 16) {
          val b = digest(j >> 1) & 0xff
          val nib = if ((j & 1) == 0) b >>> 4 else b & 0xf
          sums(j) += (if (nib >= 8) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 16) { if (sums(j) > 0) fp |= 1L << j; j += 1 }
    fp
  }
}
