package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, IntegerType}

/** Codegen'd ADC pair scorer — the PAIR-side half of IVF-ADC search
  * ([[PqAdcTable]] builds the query-side lookup table): approximate
  * `dot(query, stored)` as `Σ_s table[offset(s) + codes(s)]`, i.e. m
  * primitive lookups + adds per candidate pair instead of a dim-length
  * dot over a raw vector the index no longer stores. The sum
  * accumulates in ascending sub-space order from a 0.0 seed — the
  * engine's pinned-fold-order float discipline, replayed bit-identical
  * by the DuckDB oracle's ordered `list_reduce`.
  *
  * `offsets` (prefix sums of sub-book sizes, the [[PqAdcTable]]
  * layout) must be a foldable literal — m ints, packed
  * ([[CodebookCodec.packInts]]) or boxed. `codes` and `table` are ROW
  * data (stored side / broadcast query side) read through primitive
  * `ArrayData` accessors — no per-pair array copy. A code whose lookup
  * index falls outside the table contributes nothing (defensive: only
  * reachable by scoring codes against a table from a DIFFERENT model,
  * which the artifact contract forbids).
  *
  * Registered as SQL function `pq_adc_score` by
  * [[graft.GraftExtensions]]; auto-swept by KernelAudit. */
case class PqAdcScore(codes: Expression, table: Expression,
                      offsets: Expression) extends TernaryExpression {

  override def first: Expression = codes
  override def second: Expression = table
  override def third: Expression = offsets

  override def checkInputDataTypes(): TypeCheckResult =
    (codes.dataType, table.dataType, offsets.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _),
            ArrayType(IntegerType, _))
         | (ArrayType(IntegerType, _), ArrayType(DoubleType, _), BinaryType) =>
        if (offsets.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "pq_adc_score requires the offsets argument (3rd) to be a literal")
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        "pq_adc_score requires (array<int>, array<double>, array<int>) " +
          "or (array<int>, array<double>, binary) [CodebookCodec-packed], " +
          s"got (${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_score"

  @transient private lazy val offArr: Array[Int] =
    offsets.dataType match {
      case BinaryType =>
        CodebookCodec.unpackInts(offsets.eval().asInstanceOf[Array[Byte]])
      case _ => offsets.eval().asInstanceOf[ArrayData].toIntArray()
    }

  /** m lookups + adds, ascending sub-space order — shared by
    * interpreted eval and the generated code (reference object). */
  def score(cs: ArrayData, t: ArrayData): Double = {
    val off = offArr
    val m = math.min(cs.numElements(), off.length)
    val tn = t.numElements()
    var sum = 0.0
    var s = 0
    while (s < m) {
      val idx = off(s) + cs.getInt(s)
      if (idx >= 0 && idx < tn) sum += t.getDouble(idx)
      s += 1
    }
    sum
  }

  override def nullSafeEval(c: Any, t: Any, o: Any): Any =
    score(c.asInstanceOf[ArrayData], t.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqAdcScore", this, classOf[PqAdcScore].getName)
    nullSafeCodeGen(ctx, ev, (c, t, _) => s"${ev.value} = $self.score($c, $t);")
  }

  /** Offsets elided from plan renderings — the [[NearestCell.toString]]
    * rationale and no-unpack-on-error guard. */
  private def offsetsLabel: String =
    if (!offsets.foldable) "<offsets>"
    else try s"<offsets m=${offArr.length}>"
    catch { case scala.util.control.NonFatal(_) => "<offsets>" }
  override def toString: String =
    s"$prettyName($codes, $table, $offsetsLabel)"
  override def sql: String =
    s"$prettyName(${codes.sql}, ${table.sql}, $offsetsLabel)"

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(codes = newFirst, table = newSecond, offsets = newThird)
}
