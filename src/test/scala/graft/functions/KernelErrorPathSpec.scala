package graft.functions

import graft.SparkSpec
import graft.functions.expr.{NearestCell, NearestCellTwoLevel, NearestCells}
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** The nearest-cell kernels' ERROR path (r15 ADVICE): when a codebook
  * operand is non-foldable or mistyped — exactly what
  * checkInputDataTypes rejects — Spark renders the expression's
  * sql/toString while BUILDING the analysis error, so a rendering that
  * forces the codebook unpack would replace the intended "must be
  * literals" message with an opaque eval crash
  * (UnsupportedOperationException on an attribute). These cases pin
  * that the intended AnalysisException surfaces and that the elided
  * renderings stay payload-free and non-throwing on unresolvable
  * operands. */
class KernelErrorPathSpec extends SparkSpec {
  import spark.implicits._

  private def vecsWithBook = Seq(
    (Seq(1.0, 0.0), Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)), Seq(1.0, 1.0)))
    .toDF("v", "cb", "c2")

  test("nearest_cell with a COLUMN codebook fails analysis with the 'to be literals' message") {
    val e = intercept[AnalysisException] {
      vecsWithBook.select(
        call_function("nearest_cell", col("v"), col("cb"), col("c2"))).collect()
    }
    assert(e.getMessage.contains("to be literals"),
      s"expected the checkInputDataTypes message, got: ${e.getMessage}")
  }

  test("nearest_cells with a COLUMN codebook fails analysis with the 'to be literals' message") {
    val e = intercept[AnalysisException] {
      vecsWithBook.select(
        call_function("nearest_cells", col("v"), col("cb"), col("c2"),
          lit(1))).collect()
    }
    assert(e.getMessage.contains("to be literals"),
      s"expected the checkInputDataTypes message, got: ${e.getMessage}")
  }

  test("nearest_cell_2 with COLUMN codebooks fails analysis with the 'to be literals' message") {
    val df = Seq((Seq(1.0, 0.0), Seq(Seq(1.0, 0.0)), Seq(1.0),
      Seq(Seq(Seq(1.0, 0.0))), Seq(Seq(1.0))))
      .toDF("v", "cc", "cq", "fc", "fq")
    val e = intercept[AnalysisException] {
      df.select(call_function("nearest_cell_2", col("v"), col("cc"),
        col("cq"), col("fc"), col("fq"))).collect()
    }
    assert(e.getMessage.contains("to be literals"),
      s"expected the checkInputDataTypes message, got: ${e.getMessage}")
  }

  test("nearest_cells_2 with COLUMN codebooks fails analysis with the 'to be literals' message") {
    val df = Seq((Seq(1.0, 0.0), Seq(Seq(1.0, 0.0)), Seq(1.0),
      Seq(Seq(Seq(1.0, 0.0))), Seq(Seq(1.0))))
      .toDF("v", "cc", "cq", "fc", "fq")
    val e = intercept[AnalysisException] {
      df.select(call_function("nearest_cells_2", col("v"), col("cc"),
        col("cq"), col("fc"), col("fq"), lit(4), lit(2))).collect()
    }
    assert(e.getMessage.contains("to be literals"),
      s"expected the checkInputDataTypes message, got: ${e.getMessage}")
  }

  test("nearest_cell with a MISTYPED codebook fails analysis with the type message") {
    val e = intercept[AnalysisException] {
      vecsWithBook.select(
        call_function("nearest_cell", col("v"), lit(42), lit(7))).collect()
    }
    assert(e.getMessage.contains("requires"),
      s"expected the type-requirements message, got: ${e.getMessage}")
  }

  test("renderings on non-foldable operands are payload-free and never throw") {
    val vec = AttributeReference("v", ArrayType(DoubleType))()
    val book = AttributeReference("cb", ArrayType(ArrayType(DoubleType)))()
    val sq = AttributeReference("c2", ArrayType(DoubleType))()
    // pre-fix these forced centsMat -> cents.eval() -> throw
    assert(NearestCell(vec, book, sq).toString.contains("<codebook>"))
    assert(NearestCell(vec, book, sq).sql.contains("<codebook>"))
    val cells = NearestCells(vec, book, sq, 2)
    assert(cells.toString.contains("<codebook>"))
    val fineBook = AttributeReference("fc",
      ArrayType(ArrayType(ArrayType(DoubleType))))()
    val fineSq = AttributeReference("fq", ArrayType(ArrayType(DoubleType)))()
    val two = NearestCellTwoLevel(vec, book, sq, fineBook, fineSq)
    assert(two.toString.contains("<codebooks>") &&
      two.sql.contains("<codebooks>"))
  }

  test("pq_adc_table with a COLUMN codebook fails analysis with the 'to be a literal' message") {
    val df = Seq((Seq(1.0, 0.0), Seq(Seq(Seq(1.0), Seq(0.0)))))
      .toDF("v", "books")
    val e = intercept[AnalysisException] {
      df.select(call_function("pq_adc_table", col("v"), col("books"))).collect()
    }
    assert(e.getMessage.contains("to be a literal"),
      s"expected the checkInputDataTypes message, got: ${e.getMessage}")
  }

  test("pq_adc_score with COLUMN offsets fails analysis; mistyped inputs get the type message") {
    val df = Seq((Seq(0, 1), Seq(1.0, 2.0, 3.0), Seq(0, 2)))
      .toDF("codes", "tab", "offs")
    val e = intercept[AnalysisException] {
      df.select(call_function("pq_adc_score", col("codes"), col("tab"),
        col("offs"))).collect()
    }
    assert(e.getMessage.contains("to be a literal"),
      s"expected the checkInputDataTypes message, got: ${e.getMessage}")
    val e2 = intercept[AnalysisException] {
      df.select(call_function("pq_adc_score", col("tab"), col("codes"),
        lit(42))).collect()
    }
    assert(e2.getMessage.contains("requires"),
      s"expected the type-requirements message, got: ${e2.getMessage}")
  }

  test("PQ kernel renderings are payload-free on non-foldable operands and report shape when packed") {
    import graft.functions.expr.{CodebookCodec, PqAdcScore, PqAdcTable}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.IntegerType
    val vec = AttributeReference("v", ArrayType(DoubleType))()
    val booksAttr = AttributeReference("b",
      ArrayType(ArrayType(ArrayType(DoubleType))))()
    assert(PqAdcTable(vec, booksAttr).toString.contains("<books>"))
    assert(PqAdcTable(vec, booksAttr).sql.contains("<books>"))
    val packed = Literal(CodebookCodec.packNested(Array(
      Array(Array(1.0), Array(0.5)), Array(Array(0.0))))) // m=2, 3 cells
    assert(PqAdcTable(vec, packed).toString.contains("m=2 cells=3"))
    val codes = AttributeReference("c", ArrayType(IntegerType))()
    val tab = AttributeReference("t", ArrayType(DoubleType))()
    val offAttr = AttributeReference("o", ArrayType(IntegerType))()
    assert(PqAdcScore(codes, tab, offAttr).toString.contains("<offsets>"))
    assert(PqAdcScore(codes, tab,
      Literal(CodebookCodec.packInts(Array(0, 2)))).toString
      .contains("m=2"))
  }

  test("nearest_cell_2 rendering reports the TOTAL fine-cell count, not the coarse count") {
    import graft.functions.expr.CodebookCodec
    import org.apache.spark.sql.catalyst.expressions.Literal
    val vec = AttributeReference("v", ArrayType(DoubleType))()
    val coarse = Array(Array(1.0, 0.0), Array(0.0, 1.0)) // 2 coarse cells
    val fine = Array( // ragged: 3 + 1 = 4 fine cells total
      Array(Array(1.0, 0.0), Array(0.5, 0.5), Array(0.9, 0.1)),
      Array(Array(0.0, 1.0)))
    val e = NearestCellTwoLevel(vec,
      Literal(CodebookCodec.packMatrix(coarse)),
      Literal(CodebookCodec.packVector(coarse.map(c => c.map(x => x * x).sum))),
      Literal(CodebookCodec.packNested(fine)),
      Literal(CodebookCodec.packMatrix(
        fine.map(_.map(c => c.map(x => x * x).sum)))))
    assert(e.toString.contains("coarse=2 fine=4"), e.toString)
  }
}
