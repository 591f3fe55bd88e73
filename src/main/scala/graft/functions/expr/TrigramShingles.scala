package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, CollationSupport, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-trigram shingles of a raw text, fused into ONE pass.
  *
  * Byte-identical to the composable pipeline
  * `trigramShingles(words(normText(text)))` (lower → collapse non-[a-z0-9]
  * runs to single spaces → trim → split → adjacent trigrams joined by a
  * space → first-occurrence distinct) and therefore to the DuckDB oracle's
  * `regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')`-based shingle CTE.
  * Parity is asserted in DedupSpec over the documents table plus Unicode
  * edge cases.
  *
  * Why an Expression: the composable form runs a whole-text regex, builds
  * a word array, three sliced copies of it, two zip_with passes, and an
  * array_distinct — six materialized intermediates per row. Shingling is
  * the shared prefix of every near-dup/contamination operator (p6, p7,
  * p19), and profiling at sf0.1 put it at ~2.2 s of each of those queries'
  * 3–5 s. This expression scans the lowered bytes once: word boundaries
  * are byte-class tests (multibyte UTF-8 units have the high bit set, so
  * they can never be part of an [a-z0-9] run — byte-wise scanning equals
  * the regex's code-point semantics), trigrams are three arraycopies, and
  * distinctness is a LinkedHashSet over UTF8String.
  *
  * Lowercasing delegates to [[CollationSupport.Lower.execBinary]] — the
  * exact UTF8_BINARY branch Spark's own `lower()` generates — so Unicode
  * case mappings (İ → i + combining dot, ß, Σ) agree with the built-in by
  * construction.
  *
  * Null text → null (UnaryExpression null-intolerance, matching the
  * composable chain where every step is null-propagating). Empty / <3-word
  * text → empty array. Registered as SQL function `trigram_shingles` by
  * [[graft.GraftExtensions]].
  */
case class TrigramShingles(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"trigram_shingles requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "trigram_shingles"

  override def nullSafeEval(s: Any): Any =
    TrigramShingles.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.TrigramShingles.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared word-run scanner: `lower(text)` (the UTF8_BINARY branch of the
  * built-in) then maximal byte runs of [a-z0-9] — byte-for-byte the word
  * array of `words(normText(text))`. */
private[expr] final class WordScan(text: UTF8String) {
  val bytes: Array[Byte] = CollationSupport.Lower.execBinary(text).getBytes
  var starts = new Array[Int](16)
  var ends = new Array[Int](16)
  var n = 0
  locally {
    val len = bytes.length
    var i = 0
    while (i < len) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        val s = i
        i += 1
        while (i < len && {
          val c = bytes(i); (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
        }) i += 1
        if (n == starts.length) {
          starts = java.util.Arrays.copyOf(starts, n * 2)
          ends = java.util.Arrays.copyOf(ends, n * 2)
        }
        starts(n) = s; ends(n) = i; n += 1
      } else i += 1
    }
  }
  def word(w: Int): UTF8String =
    UTF8String.fromBytes(bytes, starts(w), ends(w) - starts(w))
}

object TrigramShingles {

  private val Empty: ArrayData = new GenericArrayData(new Array[Any](0))

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(text: UTF8String): ArrayData = {
    val scan = new WordScan(text)
    val bytes = scan.bytes
    val starts = scan.starts
    val ends = scan.ends
    val n = scan.n
    if (n < 3) return Empty
    val seen = new java.util.LinkedHashSet[UTF8String](Math.max(16, n))
    var w = 0
    while (w <= n - 3) {
      val l1 = ends(w) - starts(w)
      val l2 = ends(w + 1) - starts(w + 1)
      val l3 = ends(w + 2) - starts(w + 2)
      val out = new Array[Byte](l1 + l2 + l3 + 2)
      System.arraycopy(bytes, starts(w), out, 0, l1)
      out(l1) = ' '
      System.arraycopy(bytes, starts(w + 1), out, l1 + 1, l2)
      out(l1 + 1 + l2) = ' '
      System.arraycopy(bytes, starts(w + 2), out, l1 + l2 + 2, l3)
      seen.add(UTF8String.fromBytes(out))
      w += 1
    }
    val arr = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    new GenericArrayData(arr)
  }
}
