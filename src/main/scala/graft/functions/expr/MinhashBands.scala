package graft.functions.expr

import java.security.MessageDigest
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All MinHash band signatures of a shingle array in ONE pass.
  *
  * Band `b`'s signature is the concatenation over `r in [0, rowsPerBand)`
  * of `min over shingles of md5Hex("b.r|" + shingle)` — exactly the
  * banded-min formulation of the composable form in
  * [[graft.functions.Dedup.minhashSignatures]] and of the DuckDB oracle
  * (`min(md5(band || '.r|' || sh))`), so all three agree byte-for-byte.
  *
  * Why an Expression: the composable path explodes the shingle stream and
  * funnels it through a wide min-aggregation (a full shuffle of
  * |docs| x |shingles| rows). This expression turns signature computation
  * into pure map-side work per document row — no explode, no exchange —
  * while keeping the md5 count identical. Min tracking compares raw
  * digest bytes (unsigned lexicographic == hex-string order, since hex
  * encoding is order-preserving) and hex-encodes only the per-band winners.
  *
  * Empty input → empty array (a shingle-less doc emits no signature rows
  * after posexplode, matching the oracle where such docs never enter the
  * `sh` CTE). Registered as SQL function `minhash_bands` by
  * [[graft.GraftExtensions]].
  */
case class MinhashBands(child: Expression, bands: Int, rowsPerBand: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override def nullSafeEval(a: Any): Any =
    MinhashBands.compute(a.asInstanceOf[ArrayData], bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.MinhashBands.compute($c, $bands, $rowsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashBands {
  private val md = ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  // "b.r|" prefixes, cached per (bands, rowsPerBand) layout
  private val prefixCache = new ConcurrentHashMap[(Int, Int), Array[Array[Byte]]]()
  private def prefixes(bands: Int, rows: Int): Array[Array[Byte]] =
    prefixCache.computeIfAbsent((bands, rows), { _ =>
      (for (b <- 0 until bands; r <- 0 until rows)
        yield s"$b.$r|".getBytes("UTF-8")).toArray
    })

  private val HexDigits = "0123456789abcdef".toCharArray

  /** Unsigned lexicographic compare — the order md5 hex strings sort in. */
  private def lessThan(x: Array[Byte], y: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val a = x(i) & 0xff
      val b = y(i) & 0xff
      if (a != b) return a < b
      i += 1
    }
    false
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val n = arr.numElements()
    val slots = bands * rowsPerBand
    if (n == 0) return new GenericArrayData(new Array[Any](0))
    val pfx = prefixes(bands, rowsPerBand)
    // per-(band,row) running minimum digest
    val mins = new Array[Array[Byte]](slots)
    val digestFn = md.get()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val shingle = arr.getUTF8String(i).getBytes
        var s = 0
        while (s < slots) {
          digestFn.reset()
          digestFn.update(pfx(s))
          digestFn.update(shingle)
          val d = digestFn.digest()
          if (mins(s) == null || lessThan(d, mins(s))) mins(s) = d
          s += 1
        }
      }
      i += 1
    }
    if (mins(0) == null) return new GenericArrayData(new Array[Any](0)) // all-null shingles
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      val hex = new Array[Char](32 * rowsPerBand)
      var r = 0
      while (r < rowsPerBand) {
        val d = mins(b * rowsPerBand + r)
        var j = 0
        while (j < 16) {
          hex(r * 32 + 2 * j) = HexDigits((d(j) >> 4) & 0xf)
          hex(r * 32 + 2 * j + 1) = HexDigits(d(j) & 0xf)
          j += 1
        }
        r += 1
      }
      out(b) = UTF8String.fromString(new String(hex))
      b += 1
    }
    new GenericArrayData(out)
  }
}
