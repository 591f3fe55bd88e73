package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document word/bigram repetition counts in ONE pass — the map-side
  * kernel of the Gopher-style repetition score (p15):
  * `struct(total, dst, top, btotal, btop)` = word count, distinct-word
  * count, top-word count, bigram count, top-bigram count over the
  * normalized words of the text.
  *
  * Integer-identical to the explode → groupBy(doc, gram) → groupBy(doc)
  * formulation (kept as the parity/oracle twin in the p15 DuckDB SQL):
  * same word array ([[WordScan]] == `words(normText(text))`), same counts.
  *
  * Why an Expression: every statistic here is a PER-ROW property, but the
  * composable formulation pays four exchanges (two per gram level) plus
  * two joins to count within each document. One hash pass per row is
  * O(words) with state bounded by the document's distinct vocabulary —
  * zero shuffles at any corpus size, so at 100 TB the score runs inside
  * the scan stage. (For pathological single documents larger than
  * executor memory the exploded formulation distributes better; training
  * corpora cap documents far below that.) Bigrams never materialize
  * strings: words are interned to dense ids by the word map, a bigram is
  * the packed long (id1 << 32 | id2), and equal bigram strings ↔ equal id
  * pairs because interning is injective.
  *
  * Null text → null row (matching the composable chain's left-join path,
  * which the caller coalesces). Registered as SQL function
  * `word_rep_stats` by [[graft.GraftExtensions]].
  */
case class WordRepStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_rep_stats requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = WordRepStats.Schema
  override def prettyName: String = "word_rep_stats"

  override def nullSafeEval(s: Any): Any =
    WordRepStats.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.WordRepStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordRepStats {

  val Schema: StructType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("dst", LongType, nullable = false),
    StructField("top", LongType, nullable = false),
    StructField("btotal", LongType, nullable = false),
    StructField("btop", LongType, nullable = false)))

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(text: UTF8String): InternalRow = {
    val scan = new WordScan(text)
    val n = scan.n
    if (n == 0)
      return new GenericInternalRow(Array[Any](0L, 0L, 0L, 0L, 0L))
    // intern words -> dense ids, count per id
    val ids = new java.util.HashMap[UTF8String, Integer](Math.max(16, n))
    var counts = new Array[Int](Math.max(16, n))
    val wordIds = new Array[Int](n)
    var m = 0
    var w = 0
    while (w < n) {
      val s = scan.word(w)
      var id = ids.get(s)
      if (id == null) {
        id = Integer.valueOf(m)
        ids.put(s, id)
        if (m == counts.length) counts = java.util.Arrays.copyOf(counts, m * 2)
        m += 1
      }
      counts(id.intValue()) += 1
      wordIds(w) = id.intValue()
      w += 1
    }
    var top = 0
    var i = 0
    while (i < m) { if (counts(i) > top) top = counts(i); i += 1 }
    // bigrams as packed id pairs
    var btop = 0
    if (n >= 2) {
      val bc = new java.util.HashMap[java.lang.Long, Array[Int]](Math.max(16, n))
      w = 0
      while (w < n - 1) {
        val key = java.lang.Long.valueOf((wordIds(w).toLong << 32) | wordIds(w + 1).toLong)
        var c = bc.get(key)
        if (c == null) { c = new Array[Int](1); bc.put(key, c) }
        c(0) += 1
        if (c(0) > btop) btop = c(0)
        w += 1
      }
    }
    new GenericInternalRow(Array[Any](
      n.toLong, m.toLong, top.toLong, Math.max(0, n - 1).toLong, btop.toLong))
  }
}
