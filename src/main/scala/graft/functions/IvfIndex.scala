package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
  * scale path for similarity search (complement to the sign-LSH variant in
  * [[Similarity.lshKnn]]).
  *
  * Index build = deterministic Lloyd's k-means run with DataFrame ops:
  *   - init: the k lowest-id vectors are the seed centroids;
  *   - assign: broadcast the k centroids (k x dim doubles — trivially
  *     small), pick argmin distance via the codegen'd `vec_dot`;
  *   - update: per-dimension means as dim aggregate columns on one
  *     groupBy(cell) — corpus rows enter the partial aggregation
  *     unexploded, and only k rows of dim+1 longs cross the exchange /
  *     reach the driver (bounded by the codebook, never by the corpus).
  * Search probes the `nprobe` nearest cells: an equi-join on cell id, so
  * the expensive dot products touch ~nprobe/k of the corpus.
  *
  * Everything is deterministic (fixed seeds, fixed iteration count,
  * double arithmetic) — same index on every run at any parallelism.
  */
object IvfIndex {

  /** Trained coarse quantizer: centroid vectors by cell id. */
  case class Model(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length
  }

  /** Persist the codebook next to its inverted file: the model is the
    * other half of the stored-index artifact — an increment
    * ([[Similarity.semDedupIncrement]], probe-side [[knn]]) must assign
    * with the SAME centroids the index was built under, or the cell
    * spaces silently diverge (the ladder-grain-metadata lesson). */
  def saveModel(model: Model, path: String)
               (implicit spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    model.centroids.zipWithIndex
      .map { case (c, j) => (j, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadModel(path: String)
               (implicit spark: org.apache.spark.sql.SparkSession): Model = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .select(col("cell"), col("centroid")).as[(Int, Seq[Double])]
      .collect().sortBy(_._1)
    require(rows.nonEmpty, s"no codebook rows at $path")
    require(rows.map(_._1).toSeq == rows.indices.toSeq,
      s"codebook cells at $path are not contiguous 0..${rows.length - 1}")
    Model(rows.map(_._2.toArray))
  }

  private def centroidCol(c: Array[Double]): Column =
    array(c.map(lit(_)).toSeq: _*)

  /** Distance rank: cell = argmin_j ||x - c_j||^2 = argmin_j (||c_j||^2 - 2 x·c_j). */
  private def cellOf(vd: Column, model: Model): Column = {
    val scored = model.centroids.zipWithIndex.map { case (c, j) =>
      val c2 = c.map(x => x * x).sum
      struct((lit(c2) - lit(2.0) * Similarity.dot(vd, centroidCol(c))).as("d"),
        lit(j).as("j"))
    }
    array_min(array(scored.toSeq: _*)).getField("j")
  }

  /** Fixed-point scale for centroid accumulation: summing longs is
    * order-independent, so the trained codebook is bit-identical at ANY
    * partitioning/parallelism (a double `avg` would accumulate in shuffle
    * order and drift between local[4] and a 1000-executor run). Inputs
    * are unit-ish floats: |v|·2^40 · corpus ≪ 2^63. */
  private val FixedPointScale = 1L << 40

  /** Sample-domain for the train cap: hash-mod keeps the choice of
    * training vectors deterministic at any partitioning. */
  private val SampleDomain = 1L << 20

  /** Lloyd's iterations over (a bounded sample of) the corpus; `emb` must
    * have (idCol, vecCol).
    *
    * Training input is capped at ~`maxTrainVectors` via a deterministic
    * hash sample of the id (same device as the corpus split machinery):
    * a coarse quantizer needs a representative sample, not the corpus, so
    * training cost stops scaling with corpus size — at 100 TB, 3 Lloyd
    * passes over everything would dominate the query. Below the cap the
    * sample IS the corpus, so small-scale results (and the p12 oracle,
    * which is generated from the trained model) are unchanged. Assignment
    * ([[index]]) still covers every vector. */
  def train(emb: DataFrame, k: Int, iters: Int,
            idCol: String = "vec_id", vecCol: String = "embedding",
            maxTrainVectors: Int = 1 << 16): Model = {
    require(maxTrainVectors >= k,
      s"maxTrainVectors ($maxTrainVectors) must be >= k ($k)")
    // cache BEFORE counting: the count materializes the cache, so the
    // corpus is prepared exactly once whether or not the cap engages; the
    // sample is a filter VIEW over the cached prep (no second cache)
    val full = Similarity.prep(emb, vecCol).select(col(idCol), col("vd")).cache()
    val total = full.count()
    val p =
      if (total <= maxTrainVectors) full
      else {
        val keep = math.max(1L, maxTrainVectors * SampleDomain / total)
        val sampled =
          full.where(pmod(xxhash64(col(idCol)), lit(SampleDomain)) < keep)
        // a cap near k could undershoot the seed count — fall back whole
        if (sampled.limit(k).count() < k) full else sampled
      }
    try {
      var centroids = p.orderBy(col(idCol)).limit(k).select(col("vd"))
        .collect().map(_.getSeq[Double](0).toArray)
      val dim = centroids.headOption.map(_.length).getOrElse(0)
      val native = emb.sparkSession.catalog.functionExists("vec_sum_fixed")
      (1 to iters).foreach { _ =>
        val model = Model(centroids)
        val assigned =
          if (model.k <= InlineAssignMaxK)
            p.withColumn("cell", cellOf(col("vd"), model))
          else p.withColumn("cell", cellOfFolded(col("vd"), model))
        // per-cell per-dimension sums WITHOUT exploding the corpus by dim:
        // the one-buffer [[expr.VecSumFixed]] aggregate sums whole vectors
        // per update call (k·(dim+1) longs across the exchange); the
        // composable twin spells the identical fixed-point arithmetic as
        // dim separate sum columns (parity-tested in PipelineSpec). Either
        // way only k rows reach the driver — bounded by the codebook,
        // never the corpus.
        val next = centroids.map(_.clone())
        // count(vd), not count(*): the sums skip null vectors, so the
        // divisor must too (a cell of only-null vectors keeps its
        // centroid, like the pre-VecSumFixed explode formulation that
        // emitted no rows for it)
        if (native) {
          assigned.groupBy(col("cell"))
            .agg(call_function("vec_sum_fixed", col("vd"), lit(FixedPointScale)).as("s"),
              count(col("vd")).as("n"))
            .collect()
            .foreach { r =>
              val cell = r.getAs[Int]("cell")
              val n = r.getAs[Long]("n")
              val s = r.getSeq[Long](1)
              var i = 0
              while (n > 0 && i < dim && i < s.length) {
                next(cell)(i) = s(i).toDouble / FixedPointScale / n
                i += 1
              }
            }
        } else {
          val aggCols = (0 until dim).map { i =>
            sum((element_at(col("vd"), i + 1) * FixedPointScale).cast("long")).as(s"s$i")
          } :+ count(col("vd")).as("n")
          assigned.groupBy(col("cell"))
            .agg(aggCols.head, aggCols.tail: _*).collect()
            .foreach { r =>
              val cell = r.getAs[Int]("cell")
              val n = r.getAs[Long]("n")
              var i = 0
              while (n > 0 && i < dim) {
                // a dimension absent from EVERY vector of the cell sums to
                // NULL — keep the previous centroid value (the native
                // VecSumFixed branch does, via its i < s.length guard);
                // getAs would silently unbox NULL to 0L
                val fi = r.fieldIndex(s"s$i")
                if (!r.isNullAt(fi))
                  next(cell)(i) = r.getLong(fi).toDouble / FixedPointScale / n
                i += 1
              }
            }
        }
        centroids = next
      }
      Model(centroids)
    } finally full.unpersist()
  }

  /** Codebook size above which [[index]] switches from the inlined
    * projection to the broadcast-join assignment: [[cellOf]] expands to
    * k (c², centroid-literal, vec_dot) triples inside ONE projection,
    * which overflows the JVM's 64 KB method limit near k≈100 and drops
    * the whole stage to interpreted mode (measured: k=160 spews
    * `Code grows beyond 64 KB` and falls back). */
  val InlineAssignMaxK = 64

  /** Corpus with cell assignment (the "inverted file"). Small codebooks
    * assign with the unrolled [[cellOf]] projection; large ones with the
    * [[cellOfFolded]] runtime loop — identical output (parity-pinned in
    * SketchesSpec). */
  def index(emb: DataFrame, model: Model,
            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    Similarity.prep(emb, vecCol)
      .withColumn("cell",
        if (model.k <= InlineAssignMaxK) cellOf(col("vd"), model)
        else cellOfFolded(col("vd"), model))
      .select(col(idCol), col("vd"), col("nrm"), col("cell"))

  /** [[index]] forced down the large-codebook path (spec hook). */
  def indexViaFoldedAssign(emb: DataFrame, model: Model,
                           idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    Similarity.prep(emb, vecCol)
      .withColumn("cell", cellOfFolded(col("vd"), model))
      .select(col(idCol), col("vd"), col("nrm"), col("cell"))

  /** Large-codebook assignment: the same argmin as ONE constant-size
    * expression — the [[graft.functions.expr.NearestCell]] kernel, a
    * tight k×dim primitive loop over the codebook passed as foldable
    * literal arrays. The routes that look simpler were measured and
    * rejected at the 40× smoke point (80k vectors, k=512): the unrolled
    * [[cellOf]] overflows the JVM's 64 KB generated-method limit near
    * k≈100 and drops the stage to interpreted; a broadcast-join +
    * min-agg form materializes n·k pair rows each dragging two
    * 64-double arrays (48 s); an `array_min(transform(...))` loop keeps
    * the plan narrow but higher-order functions evaluate INTERPRETED
    * inside a codegen'd stage (99 s). The kernel runs the identical
    * arithmetic (driver-side left-fold c², strict left-to-right dot,
    * lowest-cell ties) in 3.5 s at the same point. The HOF form remains
    * below as the composable twin (parity-pinned in SketchesSpec) for
    * sessions without the extension. */
  private def cellOfFolded(vd: Column, model: Model): Column = {
    // typedlit, NOT array(lit...): CreateArray of k×dim lit nodes is a
    // ~32k-node expression tree PER occurrence (one per union branch /
    // join side), and the analyzer walks every node of every copy on
    // every action before constant folding collapses them — measured
    // ~30 s of pure driver time per self-join at k=512 over a 40-branch
    // union. typedlit is born as ONE Literal node.
    val centsLit = typedlit(model.centroids.map(_.toSeq).toSeq)
    val c2sLit = typedlit(model.centroids.map(c => c.map(x => x * x).sum).toSeq)
    if (org.apache.spark.sql.SparkSession.active.catalog.functionExists("nearest_cell"))
      call_function("nearest_cell", vd, centsLit, c2sLit)
    else {
      val cents = array(model.centroids.zipWithIndex.map { case (c, j) =>
        val c2 = c.map(x => x * x).sum
        struct(lit(c2).as("c2"), centroidCol(c).as("cvd"), lit(j).as("j"))
      }.toSeq: _*)
      array_min(transform(cents, ct =>
        struct((ct.getField("c2") - lit(2.0) * Similarity.dot(vd, ct.getField("cvd")))
          .as("d"), ct.getField("j").as("j")))).getField("j")
    }
  }

  /** The `nprobe` nearest cells of a query vector, as an array column.
    * Same size dispatch as [[index]]: the unrolled
    * `array_sort(array(<k score structs>))` hits the 64 KB codegen
    * ceiling at the same k≈100 as the assignment projection, so large
    * codebooks go through the [[graft.functions.expr.NearestCells]]
    * kernel (parity-pinned in SketchesSpec). */
  private def probeCells(vd: Column, model: Model, nprobe: Int): Column =
    if (model.k <= InlineAssignMaxK) probeCellsInline(vd, model, nprobe)
    else probeCellsFolded(vd, model, nprobe)

  private[functions] def probeCellsInline(vd: Column, model: Model, nprobe: Int): Column = {
    val scored = model.centroids.zipWithIndex.map { case (c, j) =>
      val c2 = c.map(x => x * x).sum
      struct((lit(c2) - lit(2.0) * Similarity.dot(vd, centroidCol(c))).as("d"),
        lit(j).as("j"))
    }
    slice(transform(array_sort(array(scored.toSeq: _*)), _.getField("j")), 1, nprobe)
  }

  private[functions] def probeCellsFolded(vd: Column, model: Model, nprobe: Int): Column = {
    val centsLit = typedlit(model.centroids.map(_.toSeq).toSeq)
    val c2sLit = typedlit(model.centroids.map(c => c.map(x => x * x).sum).toSeq)
    if (org.apache.spark.sql.SparkSession.active.catalog.functionExists("nearest_cells"))
      call_function("nearest_cells", vd, centsLit, c2sLit, lit(nprobe))
    else {
      // composable twin (HOFs evaluate interpreted — parity anchor, not
      // the hot path): score every centroid by position, full sort,
      // prefix — the inline route's shape over the folded literal
      val scored = transform(centsLit, (c, i) =>
        struct((element_at(c2sLit, i + 1) - lit(2.0) * Similarity.dot(vd, c)).as("d"),
          i.cast("int").as("j")))
      slice(transform(array_sort(scored), _.getField("j")), 1, nprobe)
    }
  }

  /** Approximate top-k: probe `nprobe` cells per query, exact cosine
    * within the probed cells. Output: (q_id, n_id, sim_micro). */
  def knn(emb: DataFrame, model: Model, queryPred: Column, kNeighbors: Int,
          nprobe: Int, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val idx = index(emb, model, idCol, vecCol)
    val queries = Similarity.prep(emb.where(queryPred), vecCol)
      .withColumn("cell", explode(probeCells(col("vd"), model, nprobe)))
      .select(col(idCol).as("q_id"), col("vd").as("qvd"), col("nrm").as("qnrm"), col("cell"))
    val sims = idx.join(broadcast(queries), Seq("cell"))
      .where(col("q_id") =!= col(idCol))
      .select(col("q_id"), col(idCol).as("n_id"),
        Similarity.simMicroPre(col("qvd"), col("vd"), col("qnrm"), col("nrm")).as("sim_micro"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim_micro").desc, col("n_id"))
    sims.withColumn("rn", row_number().over(w)).where(col("rn") <= kNeighbors)
      .select(col("q_id"), col("n_id"), col("sim_micro"))
  }
}
