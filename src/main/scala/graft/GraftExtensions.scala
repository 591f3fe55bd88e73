package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.AnalysisException
import graft.functions.expr.{AnchorWindowHashes, AnchorWindowPosHashes, BinCountAgg, CharHist16, MinhashBands, NearestCell, NearestCells, Simhash16, TrigramShingles, VecDot, VecSumFixed, WordRepStats, WordStats, WordTermCounts}
import graft.functions.TextFunctions

/** Engine extensions: custom Catalyst expressions registered through the
  * supported `SparkSessionExtensions` hook
  * (`spark.sql.extensions=graft.GraftExtensions`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def arity(name: String, children: Seq[Expression], n: Int): Unit =
    if (children.size != n)
      throw new AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map("functionName" -> name,
          "expectedNum" -> n.toString, "actualNum" -> children.size.toString,
          "docroot" -> ""))

  /** Integer literal argument (SQL builders run at analysis time — a
    * non-foldable argument would crash `eval()` with an unbound-attribute
    * error instead of a readable message). */
  private def intLit(name: String, e: Expression, pos: Int): Int = e match {
    case Literal(v: Int, _) => v
    case _ => throw new AnalysisException(
      errorClass = "NON_FOLDABLE_ARGUMENT",
      messageParameters = Map("funcName" -> name,
        "paramName" -> s"argument $pos", "paramType" -> "INT"))
  }

  /** Long (or int) literal argument — same analysis-time contract. */
  private def longLit(name: String, e: Expression, pos: Int): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case _ => throw new AnalysisException(
      errorClass = "NON_FOLDABLE_ARGUMENT",
      messageParameters = Map("funcName" -> name,
        "paramName" -> s"argument $pos", "paramType" -> "BIGINT"))
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        arity("vec_dot", children, 2)
        VecDot(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("nearest_cell"),
      new ExpressionInfo(classOf[NearestCell].getName, "nearest_cell"),
      (children: Seq[Expression]) => {
        arity("nearest_cell", children, 3)
        NearestCell(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("nearest_cells"),
      new ExpressionInfo(classOf[NearestCells].getName, "nearest_cells"),
      (children: Seq[Expression]) => {
        arity("nearest_cells", children, 4)
        NearestCells(children.head, children(1), children(2),
          intLit("nearest_cells", children(3), 4))
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash16"),
      new ExpressionInfo(classOf[Simhash16].getName, "simhash16"),
      (children: Seq[Expression]) => {
        arity("simhash16", children, 1)
        Simhash16(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("trigram_shingles"),
      new ExpressionInfo(classOf[TrigramShingles].getName, "trigram_shingles"),
      (children: Seq[Expression]) => {
        arity("trigram_shingles", children, 1)
        TrigramShingles(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_stats"),
      new ExpressionInfo(classOf[WordStats].getName, "word_stats"),
      (children: Seq[Expression]) => {
        arity("word_stats", children, 1)
        // constants owned by TextFunctions — one source of truth with the
        // composable twins and the DuckDB oracle generators
        WordStats(children.head, TextFunctions.Stopwords, TextFunctions.LangMarkers)
      }))
    ext.injectFunction((
      new FunctionIdentifier("char_hist16"),
      new ExpressionInfo(classOf[CharHist16].getName, "char_hist16"),
      (children: Seq[Expression]) => {
        arity("char_hist16", children, 1)
        CharHist16(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_rep_stats"),
      new ExpressionInfo(classOf[WordRepStats].getName, "word_rep_stats"),
      (children: Seq[Expression]) => {
        arity("word_rep_stats", children, 1)
        WordRepStats(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_term_counts"),
      new ExpressionInfo(classOf[WordTermCounts].getName, "word_term_counts"),
      (children: Seq[Expression]) => {
        arity("word_term_counts", children, 1)
        WordTermCounts(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("vec_sum_fixed"),
      new ExpressionInfo(classOf[VecSumFixed].getName, "vec_sum_fixed"),
      (children: Seq[Expression]) => {
        arity("vec_sum_fixed", children, 2)
        VecSumFixed(children.head, longLit("vec_sum_fixed", children(1), 2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("bin_count_agg"),
      new ExpressionInfo(classOf[BinCountAgg].getName, "bin_count_agg"),
      (children: Seq[Expression]) => {
        arity("bin_count_agg", children, 2)
        BinCountAgg(children.head, intLit("bin_count_agg", children(1), 2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_bands"),
      new ExpressionInfo(classOf[MinhashBands].getName, "minhash_bands"),
      (children: Seq[Expression]) => {
        arity("minhash_bands", children, 3)
        MinhashBands(children.head,
          intLit("minhash_bands", children(1), 2),
          intLit("minhash_bands", children(2), 3))
      }))
    ext.injectFunction((
      new FunctionIdentifier("anchor_window_hashes"),
      new ExpressionInfo(classOf[AnchorWindowHashes].getName, "anchor_window_hashes"),
      (children: Seq[Expression]) => {
        arity("anchor_window_hashes", children, 2)
        AnchorWindowHashes(children.head,
          intLit("anchor_window_hashes", children(1), 2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("anchor_window_pos_hashes"),
      new ExpressionInfo(classOf[AnchorWindowPosHashes].getName,
        "anchor_window_pos_hashes"),
      (children: Seq[Expression]) => {
        arity("anchor_window_pos_hashes", children, 2)
        AnchorWindowPosHashes(children.head,
          intLit("anchor_window_pos_hashes", children(1), 2))
      }))
    // Spark's own runtime-filter Bloom expressions, surfaced as session
    // functions (they are internal-only in OSS Spark — InjectRuntimeFilter
    // builds them directly): bloom_agg(value, estItems, numBits) -> binary
    // sketch; bloom_contains(sketch, value) -> boolean with NO false
    // negatives. Values are xxhash64-bridged on BOTH sides so insert and
    // probe hash identically. The decontamination prefilter
    // (Dedup.contaminationPairs) rides these instead of a custom sketch:
    // TypedImperativeAggregate with map-side partial merge, codegen probe.
    ext.injectFunction((
      new FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "bloom_agg"),
      (children: Seq[Expression]) => {
        arity("bloom_agg", children, 3)
        new BloomFilterAggregate(new XxHash64(Seq(children.head)),
          Literal(longLit("bloom_agg", children(1), 2)),
          Literal(longLit("bloom_agg", children(2), 3)))
      }))
    ext.injectFunction((
      new FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "bloom_contains"),
      (children: Seq[Expression]) => {
        arity("bloom_contains", children, 2)
        BloomFilterMightContain(children.head, new XxHash64(Seq(children(1))))
      }))
  }
}
