package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, IntegerType}

/** Codegen'd `nprobe`-nearest-centroids: the first `nprobe` cells of the
  * distance ranking (c2s[j] − 2·vec·cents[j] ascending, ties → lowest
  * j, NaN last) as an `array<int>` — the probe-selection rule of
  * [[graft.functions.IvfIndex.knn]] for codebooks too large to unroll
  * (the inline `array_sort(array(<k score structs>))` has the same
  * 64 KB generated-method ceiling as the assignment projection —
  * see [[NearestCell]] for the measured route comparison).
  *
  * Same primitive-matrix layout as [[NearestCell]]: the foldable
  * codebook operands are unboxed once into `double[][]`/`double[]`, and
  * per row a bounded insertion pass keeps the nprobe best (distance,
  * cell) pairs — O(k·dim + k·nprobe), no full sort, no allocation
  * beyond the output array. The comparator mirrors Spark's double
  * ordering (NaN greatest, equal distances → lower cell first) so the
  * emitted prefix is exactly the unrolled route's
  * `slice(array_sort(...), 1, nprobe)`.
  *
  * Registered as SQL function `nearest_cells(vec, cents, c2s, nprobe)`
  * by [[graft.GraftExtensions]] (`nprobe` must be an INT literal).
  */
case class NearestCells(vec: Expression, cents: Expression, c2s: Expression,
                        nprobe: Int) extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = cents
  override def third: Expression = c2s

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, cents.dataType, c2s.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _),
            ArrayType(DoubleType, _))
         | (ArrayType(DoubleType, _), BinaryType, BinaryType) =>
        if (!cents.foldable || !c2s.foldable) TypeCheckResult.TypeCheckFailure(
          "nearest_cells requires the codebook arguments (2nd and 3rd) to be literals")
        else if (nprobe < 1) TypeCheckResult.TypeCheckFailure(
          s"nearest_cells requires nprobe >= 1 (got $nprobe)")
        else TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        "nearest_cells requires (array<double>, array<array<double>>, array<double>) " +
          "or (array<double>, binary, binary) [CodebookCodec-packed], " +
          s"got (${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  /** Unboxed once; the BINARY form is the large-book hot path (boxed
    * array literals tax stage serialization, task deserialization, and
    * plan canonicalization — see [[CodebookCodec]]). */
  @transient private lazy val centsMat: Array[Array[Double]] =
    cents.dataType match {
      case BinaryType =>
        CodebookCodec.unpackMatrix(cents.eval().asInstanceOf[Array[Byte]])
      case _ =>
        val cc = cents.eval().asInstanceOf[ArrayData]
        Array.tabulate(cc.numElements())(j => cc.getArray(j).toDoubleArray())
    }
  @transient private lazy val c2Arr: Array[Double] =
    c2s.dataType match {
      case BinaryType =>
        CodebookCodec.unpackVector(c2s.eval().asInstanceOf[Array[Byte]])
      case _ => c2s.eval().asInstanceOf[ArrayData].toDoubleArray()
    }

  /** Spark double-ordering "strictly better" test for (d, j) pairs:
    * NaN ranks greatest; equal distances break to the lower cell. */
  private def better(d1: Double, j1: Int, d2: Double, j2: Int): Boolean = {
    val n1 = java.lang.Double.isNaN(d1)
    val n2 = java.lang.Double.isNaN(d2)
    if (n1 && n2) j1 < j2
    else if (n1) false
    else if (n2) true
    else d1 < d2 || (d1 == d2 && j1 < j2)
  }

  /** Bounded-insertion top-nprobe, shared by interpreted eval and the
    * generated code (via a reference object). */
  def probes(x: ArrayData): GenericArrayData = {
    val xv = x.toDoubleArray()
    val cm = centsMat
    val sq = c2Arr
    val k = cm.length
    val m = math.min(nprobe, k)
    val bd = new Array[Double](m)
    val bj = new Array[Int](m)
    var filled = 0
    var j = 0
    while (j < k) {
      val c = cm(j)
      val n = math.min(xv.length, c.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += xv(i) * c(i); i += 1 }
      val d = sq(j) - 2.0 * dot
      // insertion position: after every kept entry that is better
      var pos = filled
      while (pos > 0 && better(d, j, bd(pos - 1), bj(pos - 1))) pos -= 1
      if (pos < m) {
        val last = math.min(filled, m - 1)
        var q = last
        while (q > pos) { bd(q) = bd(q - 1); bj(q) = bj(q - 1); q -= 1 }
        bd(pos) = d; bj(pos) = j
        if (filled < m) filled += 1
      }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(bj, filled).map(Int.box))
  }

  override def nullSafeEval(v: Any, cs: Any, c2: Any): Any =
    probes(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nearestCells", this, classOf[NearestCells].getName)
    nullSafeCodeGen(ctx, ev, (v, _, _) => s"${ev.value} = $self.probes($v);")
  }

  /** Codebook operands elided from plan renderings — see
    * [[NearestCell.toString]] for the measured rationale and for why
    * the `k=` payload must not force an unpack of operands
    * [[checkInputDataTypes]] is about to reject. */
  private def codebookLabel: String =
    if (!cents.foldable || !c2s.foldable) "<codebook>"
    else try s"<codebook k=${centsMat.length}>"
    catch { case scala.util.control.NonFatal(_) => "<codebook>" }
  override def toString: String = s"$prettyName($vec, $codebookLabel, $nprobe)"
  override def sql: String = s"$prettyName(${vec.sql}, $codebookLabel, $nprobe)"


  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(vec = newFirst, cents = newSecond, c2s = newThird)
}
