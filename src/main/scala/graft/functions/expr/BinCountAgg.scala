package graft.functions.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Fixed-width bin-count histogram: one long-array buffer per group,
  * `buf(bin) += 1` per row — the dense per-key activity histogram
  * ([[graft.functions.Similarity.activityHistogramsFromEvents]]) as a
  * single aggregate whose cost is O(1) per ROW and whose exchange ships
  * one `bins`-long partial per (group, partition).
  *
  * Why a TypedImperativeAggregate (the [[VecSumFixed]] pattern): the two
  * composable formulations each lose a regime. `bins` conditional sums
  * fused into one aggregate are O(bins) per row — and past
  * `spark.sql.codegen.maxFields` the stage drops to interpreted eval
  * (probed at bins=168, ×40/×100 replicated events: 2× the wall of this
  * shape's exchange volume). The two-step (key, bin) count + cell
  * pivot keeps every pass O(1)-per-row and codegen'd, but its
  * intermediate is keys×bins CELL rows — when keys·bins rivals the
  * event count (sparse activity: fewer than `bins` events per key, the
  * common shape for hour-of-week histograms over user events), that
  * "cell-sized" exchange EXCEEDS the corpus (probed: 222 MB vs 40 MB at
  * ×100, 19.5 s vs 9.5 s min). This buffer is O(1) per row AND one
  * array partial per key — both regimes' winning half.
  *
  * Rows with a null or out-of-range bin contribute nothing (the
  * conditional-sum formulation's `when(bin === h)` matches no branch);
  * `bin` is expected pre-`pmod`ed non-negative. Empty group → all-zero
  * array, matching `coalesce(sum(...), 0)`.
  */
case class BinCountAgg(
    child: Expression,
    bins: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType if bins >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ if bins < 1 => TypeCheckResult.TypeCheckFailure(
      s"bin_count_agg requires bins >= 1, got $bins")
    case other => TypeCheckResult.TypeCheckFailure(
      s"bin_count_agg requires an int/long bin index, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bin_count_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bins)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val i = v match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
        case other => other.asInstanceOf[Number].longValue()
      }
      if (i >= 0 && i < bins) buffer(i.toInt) += 1L
    }
    buffer
  }

  /** Invariant: both buffers are length `bins` — true by construction
    * (`bins` is a literal baked into the expression, and every buffer
    * comes from [[createAggregationBuffer]] or [[deserialize]] of one),
    * so no length reconciliation is needed here. */
  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

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

  override def withNewMutableAggBufferOffset(newOffset: Int): BinCountAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BinCountAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BinCountAgg =
    copy(child = newChild)
}
