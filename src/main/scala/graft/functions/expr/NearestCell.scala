package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, IntegerType}

/** Codegen'd nearest-centroid assignment: argmin_j (c2s[j] − 2·vec·cents[j])
  * with ties to the lowest j — the k-means cell rule of
  * [[graft.functions.IvfIndex]] as ONE O(1)-codegen expression.
  *
  * Why a native kernel: the unrolled per-centroid projection overflows
  * the JVM's 64 KB generated-method limit near k≈100 (whole stage falls
  * back to interpreted), a broadcast-join + min-agg route materializes
  * n·k pair rows each dragging two 64-double arrays through the join,
  * and a `transform`-lambda loop evaluates interpreted per element
  * (higher-order functions never enter whole-stage codegen).
  *
  * The codebook operands must be FOLDABLE (literal) arrays: they are
  * evaluated once at first use and pinned as primitive `double[][]` /
  * `double[]` matrices — a literal `ArrayData` of `array<double>` is
  * Generic (boxed) underneath, and reading k·dim boxed doubles per row
  * is an order-of-magnitude tax (measured: the boxed loop ran at
  * interpreted-eval speed even inside codegen). The generated loop
  * reads the reference matrices and only the input vector through
  * `ArrayData` (Unsafe, primitive-backed).
  *
  * Distances use the driver-precomputed c² (same left-fold arithmetic
  * as the unrolled route) and the dot accumulates strictly
  * left-to-right — bit-identical doubles to [[VecDot]] and the DuckDB
  * oracle. NaN distances rank greatest (Spark's double ordering); the
  * first strict improvement wins, so equal distances keep the lowest
  * cell — exactly `min(struct(d, j))`.
  *
  * Registered as SQL function `nearest_cell` by [[graft.GraftExtensions]].
  */
case class NearestCell(vec: Expression, cents: Expression, c2s: Expression)
  extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = cents
  override def third: Expression = c2s

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, cents.dataType, c2s.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _),
            ArrayType(DoubleType, _))
         | (ArrayType(DoubleType, _), BinaryType, BinaryType) =>
        if (cents.foldable && c2s.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "nearest_cell requires the codebook arguments (2nd and 3rd) to be literals")
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        "nearest_cell requires (array<double>, array<array<double>>, array<double>) " +
          "or (array<double>, binary, binary) [CodebookCodec-packed], " +
          s"got (${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_cell"

  /** The codebook, unboxed once (operands are foldable by contract).
    * The BINARY form is the hot path for large books: a boxed
    * array-literal codebook is ~k·dim heap objects that every stage
    * serialization, task deserialization, and plan canonicalization
    * walks (see [[CodebookCodec]] for the measurement); the packed form
    * is one primitive byte[]. */
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

  @transient private lazy val kCells: Int = centsMat.length

  /** Primitive-matrix argmin shared by interpreted eval and (via
    * reference objects) the generated code. The vector is bulk-copied
    * to `double[]` FIRST: the incoming ArrayData is usually the product
    * of an array cast, which is Generic (boxed) underneath — k·dim
    * per-element `getDouble` unboxings ran the whole kernel at
    * ~65 MFlop/s/core; one `toDoubleArray()` per row (dim unboxings)
    * restores a primitive inner loop. */
  def assign(x: ArrayData): Int = {
    val xv = x.toDoubleArray()
    val cm = centsMat
    val sq = c2Arr
    var best = 0
    var bestD = Double.NaN
    var init = false
    var j = 0
    while (j < kCells) {
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

  override def nullSafeEval(v: Any, cs: Any, c2: Any): Any =
    assign(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nearestCell", this, classOf[NearestCell].getName)
    nullSafeCodeGen(ctx, ev, (v, _, _) => s"${ev.value} = $self.assign($v);")
  }

  /** Codebook operands elided from ALL plan renderings: the default
    * Expression rendering dumps the literal payload (megabytes of hex
    * for the packed form, a boxed list for the array form) into every
    * explain string, SQL-event plan description, and AQE plan-update
    * event — measured as SECONDS of driver time per query at k=6400
    * (the assign_literal_tax probe, r15). The `name(` shape is preserved for the
    * KernelAudit matchers.
    *
    * The `k=` payload is rendered ONLY when the codebook unpacks:
    * Spark builds these strings while CONSTRUCTING analysis errors
    * too, and when the operands are non-foldable or mistyped — exactly
    * what [[checkInputDataTypes]] rejects — forcing `centsMat` here
    * would replace the intended "must be literals" message with an
    * opaque eval crash (r15 ADVICE). */
  private def codebookLabel: String =
    if (!cents.foldable || !c2s.foldable) "<codebook>"
    else try s"<codebook k=${centsMat.length}>"
    catch { case scala.util.control.NonFatal(_) => "<codebook>" }
  override def toString: String = s"$prettyName($vec, $codebookLabel)"
  override def sql: String = s"$prettyName(${vec.sql}, $codebookLabel)"


  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(vec = newFirst, cents = newSecond, c2s = newThird)
}
