package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Baseline: brute-force cosine top-k (exact; the oracle). Scale path:
  * random-hyperplane LSH bucketing — signatures are a narrow per-row
  * transform, candidate generation an equi-join on (table, bucket),
  * so the pair space is bounded by bucket occupancy instead of |Q|x|C|.
  * All vector math is built-in higher-order functions (zip_with /
  * aggregate) — codegen, no UDFs, no driver collect.
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double —
    * a custom codegen'd Catalyst expression (tight primitive loop).
    * Bit-identical to the left-to-right higher-order-function fold it
    * replaces, but with no per-row array allocation and no interpreted
    * lambda calls, which matters when a pair join evaluates it millions
    * of times. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.vecDot(a, b)

  def l2norm(a: Column): Column =
    graft.functions.VectorExpressions.vecNorm(a)

  def cosine(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** Exact top-k cosine neighbors for each query vector (brute force).
    * Queries and corpus are both (id, vec) frames; output
    * (query_id, neighbor_id, cosine, rank). The query side is expected
    * to be small; Catalyst broadcasts it automatically under AQE. */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    // Barriers: norms computed once per vector, not once per pair
    // (CollapseProject would otherwise inline them above the join).
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      l2norm(col(vecCol)).as("qn")).repartition(col("query_id"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      l2norm(col(vecCol)).as("cn")).repartition(col("neighbor_id"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv"), col("qn"), col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("cosine", round(col("cosine"), 4))
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Random-hyperplane signature: bit i = sign(v . plane_i), packed into
    * a long. Deterministic planes from the seed. The definitional
    * (composed-expression) form; hot paths use [[hyperplaneSigs]],
    * which computes the identical values for all tables in one kernel. */
  def hyperplaneSignature(
      vec: Column,
      dim: Int,
      nPlanes: Int = 16,
      seed: Long = 7L): Column = {
    val planes = planesFor(dim, nPlanes, 1, seed)
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val pc = array(p.map(lit): _*)
      when(dot(vec, pc) > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Deterministic Gaussian planes for `tables` independent hash
    * tables: table t draws nPlanes x dim values from seed + t * 1013
    * (bit-compatible with per-table [[hyperplaneSignature]] calls). */
  private[graft] def planesFor(
      dim: Int, nPlanes: Int, tables: Int, seed: Long): Array[Array[Double]] =
    (0 until tables).iterator.flatMap { t =>
      val rnd = new java.util.Random(seed + t * 1013L)
      Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
    }.toArray

  /** All `tables` bucket signatures of a vector as one array<long> —
    * a single codegen kernel (graft.functions.HyperplaneSigsExpr)
    * rather than tables x nPlanes composed expression trees. */
  def hyperplaneSigs(
      vec: Column,
      dim: Int,
      nPlanes: Int,
      tables: Int,
      seed: Long = 7L): Column =
    graft.functions.SketchExpressions.hyperplaneSigs(
      vec, planesFor(dim, nPlanes, tables, seed), nPlanes)

  /** Deterministic IVF centroid training: seeded init (the nlist
    * corpus vectors with smallest xxhash64(id, seed)) followed by
    * `iters` Lloyd rounds, each one distributed pass — assign every
    * (sampled) vector to its nearest centroid with the
    * NearestCentroidsExpr kernel, then per-cell per-dimension means
    * via posexplode + groupBy. Only nlist x dim doubles ever reach the
    * driver. At corpus scale pass trainFraction < 1: k-means needs a
    * sample, not the corpus. Cells that lose all members keep their
    * previous centroid. */
  def trainCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      nlist: Int,
      iters: Int = 3,
      seed: Long = 11L,
      trainFraction: Double = 1.0): Array[Array[Double]] = {
    // The training sample is re-traversed once per Lloyd round: cache
    // it rather than re-scanning the corpus each iteration.
    val train =
      (if (trainFraction < 1.0)
        corpus.sample(withReplacement = false, trainFraction, seed)
      else corpus)
        .select(col(idCol).as("__id"), col(vecCol).as("__v"))
        .persist()
    var cents: Array[Array[Double]] = train
      .orderBy(xxhash64(col("__id"), lit(seed)), col("__id"))
      .limit(nlist)
      .select(col("__v"))
      .collect()
      .map(_.getSeq[Number](0).toArray.map(x =>
        if (x == null) 0.0 else x.doubleValue()))
    require(cents.nonEmpty, "IVF training needs a non-empty corpus")
    (0 until iters).foreach { _ =>
      val c = cents
      val means = train
        .select(
          element_at(graft.functions.VectorExpressions
            .nearestCentroids(col("__v"), c, 1), 1).as("__c"),
          posexplode(col("__v")).as(Seq("__i", "__x")))
        .groupBy("__c", "__i")
        .agg(avg(col("__x").cast("double")).as("__m"))
        .collect()
      val next = cents.map(_.clone())
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
      }
      cents = next
    }
    train.unpersist()
    cents
  }

  /** ANN top-k via IVF (inverted-file) search: the corpus partitions
    * into `nlist` Voronoi cells around trained centroids; each vector
    * is assigned to its cell once (narrow kernel pass), each query
    * probes only its `nprobe` nearest cells, and exact cosine re-ranks
    * within the probed cells — the scanned fraction is ~nprobe/nlist
    * of the corpus instead of all of it, and the candidate join is an
    * equi-join on the cell id (no pair explosion, no dedup needed:
    * cells are disjoint and probes distinct). Recall < 1 by design —
    * [[bruteForceTopK]] is the exact baseline. */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dim: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      iters: Int = 3,
      seed: Long = 11L,
      trainFraction: Double = 1.0): DataFrame = {
    val cents = trainCentroids(
      corpus, idCol, vecCol, dim, nlist, iters, seed, trainFraction)
    // A corpus smaller than nlist trains fewer centroids; probe at
    // most all of them.
    val probes = math.min(nprobe, cents.length)
    def nc(n: Int) =
      graft.functions.VectorExpressions.nearestCentroids(col("__v0"), cents, n)
    // Barriers: cell assignment + norm computed once per vector.
    val c = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__v0"))
      .select(col("neighbor_id"), col("__v0").as("cv"),
        l2norm(col("__v0")).as("cn"),
        element_at(nc(1), 1).as("__cell"))
      .repartition(col("neighbor_id"))
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("__v0"))
      .select(col("query_id"), col("__v0").as("qv"),
        l2norm(col("__v0")).as("qn"),
        explode(nc(probes)).as("__cell"))
      .repartition(col("query_id"))
    val cands = q.join(c, Seq("__cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        cosine(col("qv"), col("cv"), col("qn"), col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cands
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("cosine", round(col("cosine"), 4))
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** ANN top-k via multi-probe hyperplane LSH: candidates share a
    * signature in at least one of `tables` independent hash tables;
    * exact cosine re-ranks within candidates. Recall < 1 by design —
    * [[bruteForceTopK]] is the exact baseline. */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dim: Int,
      nPlanes: Int = 12,
      tables: Int = 4,
      seed: Long = 7L): DataFrame = {
    def signed(df: DataFrame, side: String): DataFrame = {
      // all per-table signatures in one kernel, exploded to
      // (table, bucket)
      df.select(col(idCol).as(side), col(vecCol).as(side + "_v"),
        l2norm(col(vecCol)).as(side + "_n"),
        posexplode(hyperplaneSigs(col(vecCol), dim, nPlanes, tables, seed))
          .as(Seq("table", "bucket")))
        .repartition(col(side))
    }
    val q = signed(queries, "query_id")
    val c = signed(corpus, "neighbor_id")
    val cands = q.join(c, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine",
        cosine(col("query_id_v"), col("neighbor_id_v"),
          col("query_id_n"), col("neighbor_id_n")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cands
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("cosine", round(col("cosine"), 4))
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}
