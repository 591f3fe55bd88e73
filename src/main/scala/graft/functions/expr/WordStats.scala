package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document text-analysis counts in ONE pass — the shared kernel of
  * token counting (p1), quality scoring (p2) and language-ID (p3):
  * `struct(word_cnt, alpha_chars, stop_hits, lang_guess, ws_tokens,
  * bpe_tokens)`.
  *
  * Value-identical to the composable pipeline (parity-tested in
  * PipelineSpec + a random-unicode property in TextPropertySpec):
  *   - `word_cnt`/`alpha_chars` over [[WordScan]] == `words(normText(text))`
  *     (alpha chars = summed word lengths; words are ASCII [a-z0-9] runs,
  *     so chars == bytes);
  *   - `stop_hits` / `lang_guess` membership-count the same word array
  *     against the same constant lists ([[graft.functions.TextFunctions]]
  *     owns them — the builder passes them in, one source of truth), with
  *     langGuess's exact argmax rule (Seq-order tie-break, all-zero →
  *     "und");
  *   - `ws_tokens` replicates `size(split(trim(text), "\\s+"))` including
  *     its quirks: `trim` strips only 0x20, so a trimmed text starting
  *     OR ending with other ASCII whitespace contributes a leading/
  *     trailing empty token (Spark's split uses Java split with limit -1,
  *     which keeps BOTH leading and trailing empties);
  *   - `bpe_tokens` replicates `regexp_extract_all(lower(text),
  *     "[a-z]+|[0-9]+|[^a-z0-9\\s]")`: letter runs and digit runs count
  *     one each, ASCII whitespace separates, every other CODE POINT (not
  *     byte — multibyte lead-byte counting) counts one.
  *
  * Why an Expression: p1–p3 each re-ran the whole-text regex normalize +
  * split + higher-order membership filters per query (~0.3–0.4 s each at
  * sf0.1). One byte scan per row computes all six, inside the scan stage,
  * zero shuffles. Null text → null row (the composable chain
  * null-propagates identically). Registered as `word_stats` by
  * [[graft.GraftExtensions]].
  */
case class WordStats(child: Expression, stopwords: Seq[String],
                     langMarkers: Seq[(String, Seq[String])])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_stats requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = WordStats.Schema
  override def prettyName: String = "word_stats"

  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }
  @transient private lazy val markerSets: Array[(UTF8String, java.util.HashSet[UTF8String])] =
    langMarkers.map { case (lang, ws) =>
      val s = new java.util.HashSet[UTF8String]()
      ws.foreach(w => s.add(UTF8String.fromString(w)))
      (UTF8String.fromString(lang), s)
    }.toArray

  def compute(text: UTF8String): InternalRow = {
    // --- normalized-word pass ---
    val scan = new WordScan(text)
    val n = scan.n
    var alpha = 0L
    var stopHits = 0L
    val langHits = new Array[Long](markerSets.length)
    var w = 0
    while (w < n) {
      alpha += scan.ends(w) - scan.starts(w)
      val word = scan.word(w)
      if (stopSet.contains(word)) stopHits += 1
      var l = 0
      while (l < markerSets.length) {
        if (markerSets(l)._2.contains(word)) langHits(l) += 1
        l += 1
      }
      w += 1
    }
    // argmax with declaration-order tie-break; all-zero -> und
    var best = -1
    var bestScore = 0L
    var l = 0
    while (l < langHits.length) {
      if (langHits(l) > bestScore) { best = l; bestScore = langHits(l) }
      l += 1
    }
    val guess = if (best < 0) WordStats.Und else markerSets(best)._1

    // --- raw-text whitespace tokens (split-quirk-exact) ---
    val raw = text.getBytes
    var lo = 0
    var hi = raw.length
    while (lo < hi && raw(lo) == ' ') lo += 1
    while (hi > lo && raw(hi - 1) == ' ') hi -= 1
    var wsTokens = 0L
    if (hi > lo) {
      if (WordStats.isAsciiWs(raw(lo))) wsTokens += 1 // leading empty token
      var i = lo
      while (i < hi) {
        if (!WordStats.isAsciiWs(raw(i))) {
          wsTokens += 1
          while (i < hi && !WordStats.isAsciiWs(raw(i))) i += 1
        } else i += 1
      }
      if (WordStats.isAsciiWs(raw(hi - 1))) wsTokens += 1 // trailing empty token
    }

    // --- BPE-ish tokens over the lowered text ---
    val lower = scan.bytes
    var bpe = 0L
    var i = 0
    while (i < lower.length) {
      val b = lower(i)
      if (b >= 'a' && b <= 'z') {
        bpe += 1
        while (i < lower.length && lower(i) >= 'a' && lower(i) <= 'z') i += 1
      } else if (b >= '0' && b <= '9') {
        bpe += 1
        while (i < lower.length && lower(i) >= '0' && lower(i) <= '9') i += 1
      } else if (WordStats.isAsciiWs(b)) i += 1
      else {
        // one token per CODE POINT: count only non-continuation bytes
        if ((b & 0xc0) != 0x80) bpe += 1
        i += 1
      }
    }

    new GenericInternalRow(Array[Any](n.toLong, alpha, stopHits, guess, wsTokens, bpe))
  }

  override def nullSafeEval(s: Any): Any = compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordStatsExpr", this, classOf[WordStats].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordStats {
  val Schema: StructType = StructType(Seq(
    StructField("word_cnt", LongType, nullable = false),
    StructField("alpha_chars", LongType, nullable = false),
    StructField("stop_hits", LongType, nullable = false),
    StructField("lang_guess", StringType, nullable = false),
    StructField("ws_tokens", LongType, nullable = false),
    StructField("bpe_tokens", LongType, nullable = false)))

  private[expr] val Und: UTF8String = UTF8String.fromString("und")

  /** Java-regex `\s` (ASCII-only): space, \t, \n, \x0B, \f, \r. */
  private[expr] def isAsciiWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'
}
