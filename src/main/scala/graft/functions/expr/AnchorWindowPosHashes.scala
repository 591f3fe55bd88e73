package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, CollationSupport, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Positioned sibling of [[AnchorWindowHashes]]: every word-start anchor
  * window of the normalized text as `(pos, wh)` — `pos` the 1-based
  * anchor position on the NORMALIZED text, `wh` the md5 of the
  * `windowLen`-char window there. The duplicated-span scrub needs
  * positions (a marked hash must map back to the span it covers), so
  * unlike the p26 kernel nothing is de-duplicated: a hash recurring at
  * two anchors covers both spans.
  *
  * Byte-identical to the composable pipeline
  * `transform(filter(sequence(1, len-W+1), i -> i = 1 OR
  * substring(norm, i-1, 1) = ' '), i -> struct(i, md5(substring(norm, i,
  * W))))` over `normText(text)` — and to the DuckDB oracle's positioned
  * window CTE (parity in DedupSpec). Same one-byte-pass normalization as
  * the other kernels; null text → null, normalized text shorter than the
  * window → empty array. Registered as SQL function
  * `anchor_window_pos_hashes` by [[graft.GraftExtensions]]. */
case class AnchorWindowPosHashes(child: Expression, windowLen: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if windowLen >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"anchor_window_pos_hashes requires a positive window, got $windowLen")
    case other => TypeCheckResult.TypeCheckFailure(
      s"anchor_window_pos_hashes requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", IntegerType, nullable = false),
      StructField("wh", StringType, nullable = false))), containsNull = false)
  override def prettyName: String = "anchor_window_pos_hashes"

  override def nullSafeEval(s: Any): Any =
    AnchorWindowPosHashes.compute(s.asInstanceOf[UTF8String], windowLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.AnchorWindowPosHashes.compute($c, $windowLen)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AnchorWindowPosHashes {

  private val Empty: ArrayData = new GenericArrayData(new Array[Any](0))

  /** Static entry point shared by interpreted eval and generated code
    * (byte-pass machinery shared with [[AnchorWindowHashes]] via
    * [[AnchorKernel]]). */
  def compute(text: UTF8String, w: Int): ArrayData = {
    val (norm, n) = AnchorKernel.normalize(text)
    if (n < w) return Empty
    val out = new java.util.ArrayList[Any]()
    val md = AnchorKernel.digest()
    var p = 0
    val last = n - w
    while (p <= last) {
      if (p == 0 || norm(p - 1) == ' ')
        out.add(new GenericInternalRow(
          Array[Any](p + 1, AnchorKernel.md5Hex(md, norm, p, w))))
      p += 1
    }
    if (out.isEmpty) Empty
    else new GenericArrayData(out.toArray)
  }
}
