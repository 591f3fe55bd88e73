package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Codegen'd ADC (asymmetric distance computation) lookup-table builder
  * for product quantization — the QUERY-side half of IVF-ADC search
  * (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011): for a query vector and the m sub-space
  * codebooks, emit the flattened table
  * `t[offset(s) + j] = dot(query_slice_s, books[s][j])`, laid out
  * sub-space-major (offsets = prefix sums of sub-book sizes — ragged
  * books supported). The stored side then scores a PQ-coded vector with
  * m table lookups ([[PqAdcScore]]) instead of a dim-length dot.
  *
  * Sub-space slicing is derived FROM THE BOOKS (slice s starts where
  * the previous sub-book's dimensionality ends), so the codebook
  * literal is the single source of geometry — no separate dims
  * argument to drift out of sync. Dots accumulate strictly
  * left-to-right within each slice, matching [[VecDot]] / the engine's
  * float discipline, so the DuckDB oracle replays bit-identical
  * doubles.
  *
  * Codebook operand must be a FOLDABLE literal — packed BINARY
  * ([[CodebookCodec.packNested]], the hot path: one primitive byte[]
  * in the plan instead of m·ksub·subdim boxed doubles — the r15
  * boxed-literal plan-tax class) or the boxed nested-array form (the
  * composable-twin anchor). Query-side only by construction: one table
  * per query row, never per pair.
  *
  * Registered as SQL function `pq_adc_table` by
  * [[graft.GraftExtensions]]; auto-swept by KernelAudit. */
case class PqAdcTable(vec: Expression, books: Expression)
  extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = books

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, books.dataType) match {
      case (ArrayType(DoubleType, _),
            ArrayType(ArrayType(ArrayType(DoubleType, _), _), _))
         | (ArrayType(DoubleType, _), BinaryType) =>
        if (books.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "pq_adc_table requires the codebook argument (2nd) to be a literal")
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        "pq_adc_table requires (array<double>, array<array<array<double>>>) " +
          "or (array<double>, binary) [CodebookCodec-packed], " +
          s"got (${a.catalogString}, ${b.catalogString})")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_adc_table"

  /** The m sub-books, unboxed once (foldable by contract). */
  @transient private lazy val bookMats: Array[Array[Array[Double]]] =
    books.dataType match {
      case BinaryType =>
        CodebookCodec.unpackNested(books.eval().asInstanceOf[Array[Byte]])
      case _ =>
        val bb = books.eval().asInstanceOf[ArrayData]
        Array.tabulate(bb.numElements()) { s =>
          val sub = bb.getArray(s)
          Array.tabulate(sub.numElements())(j => sub.getArray(j).toDoubleArray())
        }
    }
  /** Slice start per sub-space: prefix sums of sub-book dimensionality. */
  @transient private lazy val starts: Array[Int] =
    bookMats.scanLeft(0)(_ + _.headOption.map(_.length).getOrElse(0)).init
  @transient private lazy val tableLen: Int =
    bookMats.iterator.map(_.length).sum

  /** Flattened dot table — shared by interpreted eval and (via a
    * reference object) the generated code. The vector is bulk-copied to
    * `double[]` first (the [[NearestCell.assign]] unboxing lesson). */
  def table(x: ArrayData): GenericArrayData = {
    val xv = x.toDoubleArray()
    val out = new Array[Double](tableLen)
    var o = 0
    var s = 0
    while (s < bookMats.length) {
      val sub = bookMats(s)
      val start = starts(s)
      var j = 0
      while (j < sub.length) {
        val c = sub(j)
        val n = math.min(c.length, math.max(0, xv.length - start))
        var dot = 0.0
        var i = 0
        while (i < n) { dot += xv(start + i) * c(i); i += 1 }
        out(o) = dot
        o += 1
        j += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any, bs: Any): Any =
    table(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqAdcTable", this, classOf[PqAdcTable].getName)
    nullSafeCodeGen(ctx, ev, (v, _) => s"${ev.value} = $self.table($v);")
  }

  /** Codebook elided from plan renderings — the [[NearestCell.toString]]
    * rationale and no-unpack-on-error guard. */
  private def codebookLabel: String =
    if (!books.foldable) "<books>"
    else try s"<books m=${bookMats.length} cells=$tableLen>"
    catch { case scala.util.control.NonFatal(_) => "<books>" }
  override def toString: String = s"$prettyName($vec, $codebookLabel)"
  override def sql: String = s"$prettyName(${vec.sql}, $codebookLabel)"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, books = newRight)
}
