package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document term counts of a words array in ONE pass:
  * `array<struct<word, tf>>` with each DISTINCT element once and its
  * occurrence count — the map-side tf kernel of keyword extraction
  * (p24, [[graft.functions.TextFunctions.tfidfTopK]]).
  *
  * Value-identical to the composable pipeline
  * `explode(ws) -> groupBy(doc, word) -> count` (parity-pinned in
  * PipelineSpec), INCLUDING null elements (they count under a null
  * word, exactly as the exploded groupBy groups them). Null array ->
  * null (explode drops the document either way). Output order is first
  * occurrence, which downstream aggregation makes irrelevant.
  *
  * Why an Expression: a document's words live in ONE row's array, so
  * its term frequencies are a per-row fact — yet the composable form
  * pays a corpus-sized (doc, word) exchange to discover them (partial
  * aggregation compacts within a partition, but the exploded stream
  * still shuffles). With the kernel the tf table exists entirely inside
  * the scan stage and the first shuffle of the tf-idf pipeline is the
  * vocabulary-sized document-frequency aggregation — the steepest
  * 100x smoke curve (tfidf_topk) loses its dominant stage. Registered
  * as SQL function `word_term_counts` by [[graft.GraftExtensions]]. */
case class WordTermCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_term_counts requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = WordTermCounts.Schema
  override def prettyName: String = "word_term_counts"

  override def nullSafeEval(a: Any): Any =
    WordTermCounts.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.WordTermCounts.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordTermCounts {
  val Schema: ArrayType = ArrayType(StructType(Seq(
    StructField("word", StringType, nullable = true),
    StructField("tf", LongType, nullable = false))), containsNull = false)

  /** Static entry point shared by interpreted eval and generated code.
    * LinkedHashMap: first-occurrence order, one null key allowed (the
    * exploded groupBy groups null words too — parity). */
  def compute(ws: ArrayData): ArrayData = {
    val n = ws.numElements()
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var i = 0
    while (i < n) {
      val w = if (ws.isNullAt(i)) null else ws.getUTF8String(i)
      val slot = counts.get(w)
      if (slot == null) counts.put(w, Array(1L)) else slot(0) += 1L
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = new GenericInternalRow(Array[Any](e.getKey, e.getValue()(0)))
      k += 1
    }
    new GenericArrayData(out)
  }
}
