package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, IntegerType}

/** Codegen'd TWO-LEVEL nearest-centroid assignment (the hierarchical
  * coarse quantizer of [[graft.functions.IvfIndex.trainTwoLevel]]):
  * route the vector to its nearest COARSE cell (argmin over ≤64
  * centroids), then to the nearest centroid of that cell's FINE
  * sub-codebook; the result is the GLOBAL fine cell id — the coarse
  * cell's offset (prefix sum of preceding sub-codebook sizes, computed
  * here from the nested shapes) plus the within-cell index.
  *
  * Why it exists: SemDeDup's two sizing regimes are irreconcilable with
  * ONE flat codebook — the within-cell pair scan needs k ∝ n (else it
  * drifts toward n²/k), but flat assignment is exact over all k cells,
  * so each ingest batch pays batch·k dot products and the per-increment
  * cost grows with the STORED corpus (measured r14: the ×100 increment
  * probe regressed 2.63 → 5.73 s when k went 512 → 1600). Two levels
  * make the per-vector assignment cost coarseK + k/coarseK ≈ 2·√k while
  * the TOTAL cell count still tracks the corpus — both the scan and the
  * increment stay flat (the r14 verdict's named future-work shape).
  *
  * Same arithmetic contract as [[NearestCell]] (shared at both levels):
  * distances `c2s[j] − 2·vec·cents[j]` with driver-precomputed c², dot
  * strictly left-to-right, NaN ranks greatest, ties to the lowest index.
  * Codebook operands must be FOLDABLE and are unboxed once into
  * primitive matrices (the boxed-ArrayData tax measured on NearestCell).
  * Fine sub-codebooks may be RAGGED (a sparse coarse cell trains fewer
  * centroids); offsets derive from the actual sizes.
  *
  * Registered as SQL function `nearest_cell_2` by
  * [[graft.GraftExtensions]] (and thereby auto-swept by KernelAudit). */
case class NearestCellTwoLevel(vec: Expression, coarseCents: Expression,
                               coarseC2s: Expression, fineCents: Expression,
                               fineC2s: Expression) extends Expression {

  override def children: Seq[Expression] =
    Seq(vec, coarseCents, coarseC2s, fineCents, fineC2s)
  override def nullable: Boolean = vec.nullable
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_cell_2"

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, coarseCents.dataType, coarseC2s.dataType,
      fineCents.dataType, fineC2s.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _),
            ArrayType(DoubleType, _),
            ArrayType(ArrayType(ArrayType(DoubleType, _), _), _),
            ArrayType(ArrayType(DoubleType, _), _))
         | (ArrayType(DoubleType, _), BinaryType, BinaryType, BinaryType,
            BinaryType) =>
        if (Seq(coarseCents, coarseC2s, fineCents, fineC2s).forall(_.foldable))
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "nearest_cell_2 requires the codebook arguments (2nd-5th) to be literals")
      case other => TypeCheckResult.TypeCheckFailure(
        "nearest_cell_2 requires (array<double>, array<array<double>>, " +
          "array<double>, array<array<array<double>>>, array<array<double>>) " +
          "or (array<double>, binary, binary, binary, binary) [CodebookCodec-packed], " +
          s"got ${other.productIterator.map(_.asInstanceOf[DataType].catalogString).mkString("(", ", ", ")")}")
    }

  /** Codebooks, unboxed once (operands are foldable by contract). The
    * BINARY form is the hot path — a k∝n codebook as a boxed array
    * literal is ~k·dim heap objects taxing stage serialization, task
    * deserialization, and plan canonicalization ([[CodebookCodec]]). */
  @transient private lazy val coarseMat: Array[Array[Double]] =
    coarseCents.dataType match {
      case BinaryType =>
        CodebookCodec.unpackMatrix(coarseCents.eval().asInstanceOf[Array[Byte]])
      case _ =>
        val cc = coarseCents.eval().asInstanceOf[ArrayData]
        Array.tabulate(cc.numElements())(j => cc.getArray(j).toDoubleArray())
    }
  @transient private lazy val coarseSq: Array[Double] =
    coarseC2s.dataType match {
      case BinaryType =>
        CodebookCodec.unpackVector(coarseC2s.eval().asInstanceOf[Array[Byte]])
      case _ => coarseC2s.eval().asInstanceOf[ArrayData].toDoubleArray()
    }
  @transient private lazy val fineMats: Array[Array[Array[Double]]] =
    fineCents.dataType match {
      case BinaryType =>
        CodebookCodec.unpackNested(fineCents.eval().asInstanceOf[Array[Byte]])
      case _ =>
        val fc = fineCents.eval().asInstanceOf[ArrayData]
        Array.tabulate(fc.numElements()) { c =>
          val sub = fc.getArray(c)
          Array.tabulate(sub.numElements())(j => sub.getArray(j).toDoubleArray())
        }
    }
  @transient private lazy val fineSqs: Array[Array[Double]] =
    fineC2s.dataType match {
      case BinaryType =>
        CodebookCodec.unpackMatrix(fineC2s.eval().asInstanceOf[Array[Byte]])
      case _ =>
        val f2 = fineC2s.eval().asInstanceOf[ArrayData]
        Array.tabulate(f2.numElements())(c => f2.getArray(c).toDoubleArray())
    }
  /** Global-id base per coarse cell: prefix sums of fine sizes. */
  @transient private lazy val offsets: Array[Int] =
    fineMats.scanLeft(0)(_ + _.length).init

  private def argmin(xv: Array[Double], cm: Array[Array[Double]],
                     sq: Array[Double]): Int = {
    var best = 0
    var bestD = Double.NaN
    var init = false
    var j = 0
    while (j < cm.length) {
      val c = cm(j)
      val n = math.min(xv.length, c.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += xv(i) * c(i); i += 1 }
      val d = sq(j) - 2.0 * dot
      if (!init || d < bestD ||
        (java.lang.Double.isNaN(bestD) && !java.lang.Double.isNaN(d))) {
        init = true; bestD = d; best = j
      }
      j += 1
    }
    best
  }

  /** coarse argmin, then fine argmin within the routed sub-codebook;
    * returns the GLOBAL fine cell id. An empty sub-codebook (possible
    * only if a caller hand-built a degenerate model) returns the
    * offset itself. */
  def assign(x: ArrayData): Int = {
    val xv = x.toDoubleArray()
    val c = argmin(xv, coarseMat, coarseSq)
    val sub = fineMats(c)
    if (sub.isEmpty) offsets(c)
    else offsets(c) + argmin(xv, sub, fineSqs(c))
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) null else assign(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val self = ctx.addReferenceObj("nearestCell2", this,
      classOf[NearestCellTwoLevel].getName)
    val vecCode = vec.genCode(ctx)
    ev.copy(code =
      code"""
        ${vecCode.code}
        boolean ${ev.isNull} = ${vecCode.isNull};
        int ${ev.value} = -1;
        if (!${ev.isNull}) {
          ${ev.value} = $self.assign(${vecCode.value});
        }""")
  }

  /** Codebook operands elided from plan renderings — see
    * [[NearestCell.toString]] for the measured rationale and for why
    * the size payload must not force an unpack of operands
    * [[checkInputDataTypes]] is about to reject. `fine=` is the TOTAL
    * fine-cell count across sub-codebooks (r15 ADVICE: `offsets.length`
    * rendered the coarse count twice). */
  private def codebookLabel: String =
    if (!Seq(coarseCents, coarseC2s, fineCents, fineC2s).forall(_.foldable))
      "<codebooks>"
    else try s"<codebooks coarse=${coarseMat.length} " +
      s"fine=${fineMats.iterator.map(_.length).sum}>"
    catch { case scala.util.control.NonFatal(_) => "<codebooks>" }
  override def toString: String = s"$prettyName($vec, $codebookLabel)"
  override def sql: String = s"$prettyName(${vec.sql}, $codebookLabel)"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(vec = newChildren(0), coarseCents = newChildren(1),
      coarseC2s = newChildren(2), fineCents = newChildren(3),
      fineC2s = newChildren(4))
}
