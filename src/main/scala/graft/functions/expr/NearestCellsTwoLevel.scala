package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, IntegerType}

/** Codegen'd TWO-LEVEL probe-cell selection — the `nprobe` best GLOBAL
  * fine cells among the `coarseProbe` nearest coarse cells' sub-books,
  * as an `array<int>`: the [[graft.functions.IvfIndex.probeCells2]]
  * rule (knn2's query-side routing) as one constant-size expression.
  *
  * Why it exists (r16, measured): the composable probeCells2 embeds
  * the FULL nested fine codebook as a boxed `typedlit` — at k∝n depth
  * that is the same plan/literal tax class the r15 CodebookCodec fix
  * eliminated from assignment (knn_recall ×100: the two-level route
  * summed 33.9 s of task deserialization vs 20.9 s for the flat book
  * at the same k, wall 14.9 vs 13.5 s despite ~20× fewer flops). Here
  * the codebooks ride packed BINARY literals and the ranking is a
  * primitive bounded-insertion pass — O(coarseK·dim +
  * coarseProbe·(k/coarseK)·(dim + nprobe)), no full sort.
  *
  * Output is BIT-IDENTICAL to the HOF twin (parity-pinned in
  * SketchesSpec): coarse selection is [[NearestCells]]' rule (distance
  * asc, NaN last, ties → lower cell), and the fine ranking reproduces
  * `slice(array_sort(flatten(...)), 1, nprobe)` over (d, global id)
  * structs — Spark's double ordering with ties to the lower global id.
  * Only the coarse SET matters for the fine pass (the flatten order is
  * erased by the global sort), which is why bounded insertion at both
  * levels is equivalent.
  *
  * Registered as SQL function
  * `nearest_cells_2(vec, cc, cq, fc, fq, nprobe, coarseProbe)` by
  * [[graft.GraftExtensions]] (`nprobe`/`coarseProbe` must be INT
  * literals); auto-swept by KernelAudit. */
case class NearestCellsTwoLevel(vec: Expression, coarseCents: Expression,
                                coarseC2s: Expression, fineCents: Expression,
                                fineC2s: Expression, nprobe: Int,
                                coarseProbe: Int) extends Expression {

  override def children: Seq[Expression] =
    Seq(vec, coarseCents, coarseC2s, fineCents, fineC2s)
  override def nullable: Boolean = vec.nullable
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells_2"

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, coarseCents.dataType, coarseC2s.dataType,
      fineCents.dataType, fineC2s.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _),
            ArrayType(DoubleType, _),
            ArrayType(ArrayType(ArrayType(DoubleType, _), _), _),
            ArrayType(ArrayType(DoubleType, _), _))
         | (ArrayType(DoubleType, _), BinaryType, BinaryType, BinaryType,
            BinaryType) =>
        if (!Seq(coarseCents, coarseC2s, fineCents, fineC2s).forall(_.foldable))
          TypeCheckResult.TypeCheckFailure(
            "nearest_cells_2 requires the codebook arguments (2nd-5th) to be literals")
        else if (nprobe < 1) TypeCheckResult.TypeCheckFailure(
          s"nearest_cells_2 requires nprobe >= 1 (got $nprobe)")
        else if (coarseProbe < 1) TypeCheckResult.TypeCheckFailure(
          s"nearest_cells_2 requires coarseProbe >= 1 (got $coarseProbe)")
        else TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        "nearest_cells_2 requires (array<double>, array<array<double>>, " +
          "array<double>, array<array<array<double>>>, array<array<double>>) " +
          "or (array<double>, binary, binary, binary, binary) [CodebookCodec-packed], " +
          s"got ${other.productIterator.map(_.asInstanceOf[DataType].catalogString).mkString("(", ", ", ")")}")
    }

  /** Codebooks, unboxed once (operands foldable by contract); the
    * BINARY form is the hot path ([[CodebookCodec]]). */
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

  /** Spark double-ordering "strictly better" for (d, j) pairs — the
    * [[NearestCells.better]] rule: NaN greatest, ties → lower j. */
  private def better(d1: Double, j1: Int, d2: Double, j2: Int): Boolean = {
    val n1 = java.lang.Double.isNaN(d1)
    val n2 = java.lang.Double.isNaN(d2)
    if (n1 && n2) j1 < j2
    else if (n1) false
    else if (n2) true
    else d1 < d2 || (d1 == d2 && j1 < j2)
  }

  /** Bounded insertion of (d, j) into parallel arrays holding the m
    * best so far; returns the new fill count. */
  private def insert(bd: Array[Double], bj: Array[Int], filled: Int,
                     m: Int, d: Double, j: Int): Int = {
    var pos = filled
    while (pos > 0 && better(d, j, bd(pos - 1), bj(pos - 1))) pos -= 1
    if (pos >= m) return filled
    var q = math.min(filled, m - 1)
    while (q > pos) { bd(q) = bd(q - 1); bj(q) = bj(q - 1); q -= 1 }
    bd(pos) = d; bj(pos) = j
    math.min(filled + 1, m)
  }

  /** coarse top-coarseProbe, then top-nprobe of (distance, GLOBAL fine
    * id) across the selected sub-books — shared by interpreted eval
    * and the generated code (reference object). */
  def probes(x: ArrayData): GenericArrayData = {
    val xv = x.toDoubleArray()
    val cm = coarseMat
    val cq = coarseSq
    // level 1: the coarseProbe nearest coarse cells
    val cpm = math.min(coarseProbe, cm.length)
    val cbd = new Array[Double](cpm)
    val cbj = new Array[Int](cpm)
    var cFilled = 0
    var j = 0
    while (j < cm.length) {
      val c = cm(j)
      val n = math.min(xv.length, c.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += xv(i) * c(i); i += 1 }
      cFilled = insert(cbd, cbj, cFilled, cpm, cq(j) - 2.0 * dot, j)
      j += 1
    }
    // level 2: rank every fine centroid of the selected cells globally
    val m = nprobe
    val bd = new Array[Double](m)
    val bj = new Array[Int](m)
    var filled = 0
    var s = 0
    while (s < cFilled) {
      val cc = cbj(s)
      val sub = fineMats(cc)
      val sq = fineSqs(cc)
      val base = offsets(cc)
      var f = 0
      while (f < sub.length) {
        val c = sub(f)
        val n = math.min(xv.length, c.length)
        var dot = 0.0
        var i = 0
        while (i < n) { dot += xv(i) * c(i); i += 1 }
        filled = insert(bd, bj, filled, m, sq(f) - 2.0 * dot, base + f)
        f += 1
      }
      s += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(bj, filled).map(Int.box))
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) null else probes(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val self = ctx.addReferenceObj("nearestCells2", this,
      classOf[NearestCellsTwoLevel].getName)
    val vecCode = vec.genCode(ctx)
    val arrCls = classOf[GenericArrayData].getName
    ev.copy(code =
      code"""
        ${vecCode.code}
        boolean ${ev.isNull} = ${vecCode.isNull};
        $arrCls ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = $self.probes(${vecCode.value});
        }""")
  }

  /** Codebook operands elided from plan renderings — see
    * [[NearestCell.toString]] for the measured rationale and the
    * no-unpack-on-error guard. */
  private def codebookLabel: String =
    if (!Seq(coarseCents, coarseC2s, fineCents, fineC2s).forall(_.foldable))
      "<codebooks>"
    else try s"<codebooks coarse=${coarseMat.length} " +
      s"fine=${fineMats.iterator.map(_.length).sum}>"
    catch { case scala.util.control.NonFatal(_) => "<codebooks>" }
  override def toString: String =
    s"$prettyName($vec, $codebookLabel, $nprobe, $coarseProbe)"
  override def sql: String =
    s"$prettyName(${vec.sql}, $codebookLabel, $nprobe, $coarseProbe)"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(vec = newChildren(0), coarseCents = newChildren(1),
      coarseC2s = newChildren(2), fineCents = newChildren(3),
      fineC2s = newChildren(4))
}
