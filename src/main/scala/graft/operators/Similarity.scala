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

  /** Mean-pool vectors per group — the chunk-embeddings → document-
    * vector step of an embedding pipeline (mean of each dimension
    * over the group's vectors). Relational shape that survives any
    * scale: posexplode to (group, dim, value), ONE map-side-combined
    * sum per (group, dim) — the shuffle carries a partial (sum,
    * count) per dimension, never whole vectors — then reassembly by
    * sorted dimension. Groups with vectors of inconsistent lengths
    * refuse loudly (a silent ragged mean is always a bug upstream).
    *
    * The per-dimension sum accumulates in `decimal(30,15)`, NOT
    * double: double addition is non-associative, so a double mean
    * shifts its last ulp with the partial-aggregation order (which
    * varies with partitioning and scheduling) — the r19 q_embed_pool
    * driver failure. The decimal cast is a deterministic PER-VALUE
    * rounding and decimal addition is exact and associative, so the
    * pooled vector is bit-identical under any partitioning. */
  def meanPool(
      df: DataFrame,
      groupCol: String,
      vecCol: String,
      out: String = "embedding"): DataFrame = {
    val dims = df.select(col(groupCol).as("__g"),
      posexplode(col(vecCol)).as(Seq("__d", "__v")))
      .groupBy(col("__g"), col("__d"))
      .agg((sum(col("__v").cast("double").cast("decimal(30,15)"))
        .cast("double") / count(lit(1))).as("__m"),
        count(lit(1)).as("__n"))
    dims.groupBy(col("__g"))
      .agg(
        transform(
          array_sort(collect_list(struct(col("__d"), col("__m")))),
          e => e.getField("__m")).as("__vec"),
        min(col("__n")).as("__nmin"), max(col("__n")).as("__nmax"))
      .select(col("__g").as(groupCol),
        // the ragged check rides INSIDE the output column so pruning
        // can never elide it
        when(col("__nmin") =!= col("__nmax"), raise_error(concat(
          lit("meanPool: group "), col("__g").cast("string"),
          lit(" mixes vector lengths - dimension counts range "),
          col("__nmin").cast("string"), lit(".."),
          col("__nmax").cast("string"))))
          .otherwise(col("__vec")).as(out))
  }

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

  /** Deterministic IVF centroid training in ONE Spark job: a
    * hash-ranked bounded sample (the `maxTrainVectors` corpus vectors
    * with smallest xxhash64(id, seed) — at most maxTrainVectors x dim
    * doubles ever reach the driver) is collected once, then seeded
    * Forgy init (the nlist smallest-hash vectors) and all `iters`
    * Lloyd rounds run driver-side over that sample in a tight loop.
    *
    * k-means needs a SAMPLE, not the corpus — this is the standard
    * IVF training shape: at 100 TB, `trainFraction` thins the scan
    * before the TakeOrdered selection and the driver cost stays
    * bounded by the cap regardless of corpus size, while the previous
    * design's per-iteration distributed passes (init job + iters
    * shuffle jobs over a cached sample) paid scheduling and codegen
    * for data that was driver-bounded all along.
    *
    * Assignment ties break to the lowest centroid index and empty
    * cells keep their previous centroid, mirroring
    * [[graft.functions.VectorExpressions.nearestCentroids]] so search
    * and training agree on cell geometry. */
  def trainCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      nlist: Int,
      iters: Int = 3,
      seed: Long = 11L,
      trainFraction: Double = 1.0,
      maxTrainVectors: Int = 16384): Array[Array[Double]] = {
    val vecs = sampledVectors(
      corpus, idCol, vecCol, seed, trainFraction, maxTrainVectors)
    lloyd(vecs, nlist, iters)
  }

  /** ONE bounded Spark job: the `maxTrainVectors` corpus vectors with
    * smallest xxhash64(id, seed), as driver-side double arrays. */
  private def sampledVectors(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      seed: Long,
      trainFraction: Double,
      maxTrainVectors: Int): Array[Array[Double]] = {
    val sample =
      (if (trainFraction < 1.0)
        corpus.sample(withReplacement = false, trainFraction, seed)
      else corpus)
        .select(col(idCol).as("__id"), col(vecCol).as("__v"))
        .orderBy(xxhash64(col("__id"), lit(seed)), col("__id"))
        .limit(maxTrainVectors)
        .select(col("__v"))
        .collect()
    val vecs: Array[Array[Double]] = sample.map(_.getSeq[Number](0)
      .toArray.map(x => if (x == null) 0.0 else x.doubleValue()))
    require(vecs.nonEmpty, "vector-index training needs a non-empty corpus")
    vecs
  }

  /** Driver-side Lloyd with Forgy init (first `nlist` sample vectors).
    * Assignment ties break to the lowest centroid index and empty
    * cells keep their previous centroid, mirroring the search kernel. */
  private def lloyd(
      vecs: Array[Array[Double]],
      nlist: Int,
      iters: Int): Array[Array[Double]] = {
    var cents: Array[Array[Double]] = vecs.take(nlist).map(_.clone())
    (0 until iters).foreach { _ =>
      val k = cents.length
      val sums = Array.ofDim[Double](k, cents(0).length)
      val counts = new Array[Long](k)
      vecs.foreach { v =>
        // Nearest centroid by squared L2; missing components are 0.
        var best = 0
        var bd = Double.PositiveInfinity
        var c = 0
        while (c < k) {
          val ct = cents(c)
          var acc = 0.0
          var i = 0
          while (i < ct.length) {
            val xv = if (i < v.length) v(i) else 0.0
            val d = xv - ct(i)
            acc += d * d
            i += 1
          }
          if (acc < bd) { bd = acc; best = c }
          c += 1
        }
        val s = sums(best)
        var i = 0
        val n = math.min(v.length, s.length)
        while (i < n) { s(i) += v(i); i += 1 }
        counts(best) += 1
      }
      val next = cents.map(_.clone())
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var i = 0
          while (i < next(c).length) {
            next(c)(i) = sums(c)(i) / counts(c)
            i += 1
          }
        }
        c += 1
      }
      cents = next
    }
    cents
  }

  /** Product-quantization codebooks: the vector space splits into `m`
    * subspaces of dim/m dimensions; each gets its own `ksub`-centroid
    * Lloyd codebook, all trained from ONE bounded sample collect. A PQ
    * code is then m small ints (m bytes at ksub=256, m nibbles at 16)
    * instead of dim floats — the compressed-scan ANN representation. */
  def trainPqCodebooks(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int,
      ksub: Int,
      iters: Int = 3,
      seed: Long = 11L,
      trainFraction: Double = 1.0,
      maxTrainVectors: Int = 16384): Array[Array[Array[Double]]] = {
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    val vecs = sampledVectors(
      corpus, idCol, vecCol, seed, trainFraction, maxTrainVectors)
    (0 until m).map { s =>
      lloyd(vecs.map(v =>
        (0 until dsub).map(j =>
          if (s * dsub + j < v.length) v(s * dsub + j) else 0.0).toArray),
        ksub, iters)
    }.toArray
  }

  /** ANN top-k via product quantization: corpus vectors compress to m
    * per-subspace centroid codes (one narrow kernel pass); each query
    * scans ALL codes with the asymmetric distance (codebook lookups,
    * PqAdcExpr) instead of the raw vectors — the scan touches m ints
    * per corpus row rather than dim floats, the 100 TB trade. Exact
    * squared-L2 re-ranking is deliberately absent: recall < 1 by
    * design, [[bruteForceL2TopK]] is the exact baseline. */
  def pqTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dim: Int,
      m: Int = 8,
      ksub: Int = 16,
      iters: Int = 3,
      seed: Long = 11L,
      trainFraction: Double = 1.0,
      maxTrainVectors: Int = 16384): DataFrame = {
    val books = trainPqCodebooks(corpus, idCol, vecCol, dim, m, ksub,
      iters, seed, trainFraction, maxTrainVectors)
    val enc = corpus.select(col(idCol).as("neighbor_id"),
      graft.functions.VectorExpressions.pqEncode(col(vecCol), books)
        .as("__codes"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val scored = enc.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("__dist", graft.functions.VectorExpressions.pqAdc(
        col("__qv"), col("__codes"), books))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__dist").asc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Exact squared-L2 top-k (||a-b||^2 = |a|^2 + |b|^2 - 2 a.b via the
    * codegen dot kernel) — the baseline [[pqTopK]]'s recall contract
    * grades against. */
  def bruteForceL2TopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    import graft.functions.VectorExpressions.vecDot
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__cv"),
      vecDot(col(vecCol), col(vecCol)).as("__cn2"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qv"),
      vecDot(col(vecCol), col(vecCol)).as("__qn2"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("__dist",
        col("__qn2") + col("__cn2") - lit(2.0) * vecDot(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__dist").asc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
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

  /** ANN top-k via IVF-PQ — the composed index and the actual 100 TB
    * shape: the corpus partitions into `nlist` Voronoi cells AND
    * compresses to m-int PQ codes (both from ONE bounded training
    * sample each); a query probes only its `nprobe` nearest cells via
    * an equi-join on the cell id — never a cross join — and scans just
    * those cells' CODES with the asymmetric distance. Scan cost is
    * ~(nprobe/nlist) x m ints per corpus row, versus all-cells m ints
    * for [[pqTopK]] and probed-cells dim floats for [[ivfTopK]].
    * Recall < 1 by design; [[bruteForceL2TopK]] is the exact baseline. */
  def ivfPqTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dim: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      m: Int = 8,
      ksub: Int = 16,
      iters: Int = 3,
      seed: Long = 11L,
      trainFraction: Double = 1.0,
      maxTrainVectors: Int = 16384): DataFrame = {
    val cents = trainCentroids(corpus, idCol, vecCol, dim, nlist, iters,
      seed, trainFraction, maxTrainVectors)
    val books = trainPqCodebooks(corpus, idCol, vecCol, dim, m, ksub,
      iters, seed, trainFraction, maxTrainVectors)
    val probes = math.min(nprobe, cents.length)
    def nc(n: Int) =
      graft.functions.VectorExpressions.nearestCentroids(col("__v0"), cents, n)
    // Barriers: cell assignment + PQ encoding computed once per vector
    // (CollapseProject would otherwise recompute the kernels above the
    // join).
    val c = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__v0"))
      .select(col("neighbor_id"),
        element_at(nc(1), 1).as("__cell"),
        graft.functions.VectorExpressions.pqEncode(col("__v0"), books)
          .as("__codes"))
      .repartition(col("neighbor_id"))
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("__v0"))
      .select(col("query_id"), col("__v0").as("__qv"),
        explode(nc(probes)).as("__cell"))
      .repartition(col("query_id"))
    val cands = q.join(c, Seq("__cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("__dist", graft.functions.VectorExpressions.pqAdc(
        col("__qv"), col("__codes"), books))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__dist").asc, col("neighbor_id"))
    cands
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
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
