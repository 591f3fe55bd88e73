package graft.functions

import graft.functions.expr.CodebookCodec
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The packed-binary codebook encoding that lets nearest-cell kernels
  * carry large books as ONE primitive byte[] literal: round-trip
  * properties over ragged/empty/extreme shapes (deterministic
  * fixed-seed draws, the TextPropertySpec convention). No SparkSession
  * — the codec is pure. */
class CodebookCodecSpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int = 40): Seq[A] =
    (1 to n).map(i =>
      gen.pureApply(Gen.Parameters.default.withSize(4 + i), Seed(i.toLong)))

  private val doubleGen = Gen.oneOf(
    Gen.choose(-1e3, 1e3),
    Gen.oneOf(0.0, -0.0, Double.MinPositiveValue, 1e308, -1e308))
  private val rowGen = Gen.choose(0, 9).flatMap(n => Gen.listOfN(n, doubleGen))
  private val matrixGen =
    Gen.choose(0, 8).flatMap(k => Gen.listOfN(k, rowGen))
      .map(_.map(_.toArray).toArray)

  test("vector round-trip: arbitrary doubles, bit-exact") {
    samples(rowGen).foreach { v =>
      val arr = v.toArray
      val back = CodebookCodec.unpackVector(CodebookCodec.packVector(arr))
      assert(back.toSeq.map(java.lang.Double.doubleToRawLongBits) ===
        arr.toSeq.map(java.lang.Double.doubleToRawLongBits))
    }
  }

  test("matrix round-trip: ragged rows, empty rows, empty matrix") {
    samples(matrixGen).foreach { m =>
      val back = CodebookCodec.unpackMatrix(CodebookCodec.packMatrix(m))
      assert(back.length === m.length)
      back.zip(m).foreach { case (b, a) => assert(b.toSeq === a.toSeq) }
    }
    assert(CodebookCodec.unpackMatrix(
      CodebookCodec.packMatrix(Array.empty)).isEmpty)
  }

  test("nested round-trip: ragged sub-books incl. empty, sizes preserved") {
    val nestedGen = Gen.choose(0, 5).flatMap(c => Gen.listOfN(c, matrixGen))
      .map(_.toArray)
    samples(nestedGen, 25).foreach { t =>
      val back = CodebookCodec.unpackNested(CodebookCodec.packNested(t))
      assert(back.length === t.length)
      back.zip(t).foreach { case (bm, am) =>
        assert(bm.length === am.length)
        bm.zip(am).foreach { case (b, a) => assert(b.toSeq === a.toSeq) }
      }
    }
  }

  test("NaN survives the round-trip bit-exactly (the kernels' NaN-ranks-greatest rule depends on it)") {
    val withNaN = Array(Array(Double.NaN, 1.0), Array(Double.PositiveInfinity))
    val back = CodebookCodec.unpackMatrix(CodebookCodec.packMatrix(withNaN))
    assert(java.lang.Double.isNaN(back(0)(0)))
    assert(back(0)(1) === 1.0)
    assert(back(1)(0).isPosInfinity)
  }
}
