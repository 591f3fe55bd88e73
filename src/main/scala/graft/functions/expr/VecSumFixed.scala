package graft.functions.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Element-wise fixed-point sum of double vectors: each element
  * contributes `(v * scale).toLong` (the exact arithmetic of
  * `sum((element_at(vd, i+1) * scale).cast("long"))` per dimension), and
  * long addition makes the result independent of row order and
  * partitioning — the determinism the IVF codebook build rests on.
  *
  * Why a TypedImperativeAggregate: the k-means update step needs
  * per-cell per-dimension sums. A posexplode formulation multiplies the
  * corpus by dim before the map-side combine sees it (64× the rows at
  * dim=64); a dim-wide column formulation keeps row volume down but
  * generates dim separate aggregate buffers whose codegen grows (and
  * recompiles per Lloyd iteration, since each iteration is a new plan).
  * One imperative buffer per (cell, partition) sums a whole vector per
  * update call — O(dim) longs of state, partial-aggregated by
  * ObjectHashAggregate, `k · (dim+1)` longs across the exchange.
  *
  * Rows whose vector is null are skipped (like the column sums it
  * replaces); per-element nulls contribute nothing. Vectors of uneven
  * length sum over the positions they have (the element_at formulation's
  * null-skip). Empty input → empty array.
  */
case class VecSumFixed(
    child: Expression,
    scale: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_sum_fixed requires array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "vec_sum_fixed"

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val buf = if (buffer.length >= n) buffer
      else java.util.Arrays.copyOf(buffer, n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) buf(i) += (arr.getDouble(i) * scale).toLong
      i += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    val (big, small) = if (b1.length >= b2.length) (b1, b2) else (b2, b1)
    var i = 0
    while (i < small.length) { big(i) += small(i); i += 1 }
    big
  }

  override def eval(buffer: Array[Long]): Any =
    new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumFixed =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumFixed =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecSumFixed =
    copy(child = newChild)
}
