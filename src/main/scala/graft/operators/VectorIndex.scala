package graft.operators

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GraftFs, TypedJson}

/** A PERSISTED IVF(-PQ) vector index: train once, query many times.
  *
  * [[Similarity.ivfTopK]] / [[Similarity.ivfPqTopK]] retrain their
  * centroids and codebooks on every call — fine for one-shot
  * analytics, wrong for the production shape where one 100 TB corpus
  * serves thousands of query batches. [[build]] runs the bounded
  * training ONCE and persists the whole index as a self-describing
  * directory:
  *
  *   - cell assignments as a graft dataset range-clustered on the
  *     cell id (`cell, id, vec, norm[, codes]`), written through the
  *     `format("graft")` sink so the sidecar carries per-file cell
  *     bounds — a probe's `cell IN (...)` filter prunes whole FILES
  *     at plan time, the on-disk analogue of "scan only the probed
  *     cells";
  *   - centroids + PQ codebooks (KBs: nlist x dim + m x ksub x dim/m
  *     doubles) in a `_graft_ivf` JSON sidecar the query path reads
  *     driver-side — no Spark job, no retraining, ever.
  *
  * [[topK]] (exact-vector cosine re-rank) and [[pqTopK]] (asymmetric
  * distance over the stored codes) then match the one-shot operators'
  * results bit-for-bit when built with the same parameters, because
  * training is the same deterministic seeded procedure — only WHEN it
  * runs changes. Scale shape per query batch: one driver JSON read,
  * one bounded distinct-cells collect (≤ nlist ints by construction),
  * one pruned scan of the probed cells, one equi-join on cell id.
  *
  * A GROWING corpus absorbs through [[addVectors]]: new vectors are
  * assigned to the frozen cells / encoded with the frozen codebooks
  * and appended incrementally — no retraining, no rewrite, and no
  * read of pre-existing index files. The optional `corpusDir`
  * identity lets queries warn when the corpus moved on without an
  * add ([[corpusDrift]]).
  */
object VectorIndex {

  val IndexFile = "_graft_ivf"

  /** Driver-side index metadata: the trained geometry, plus (when a
    * corpus directory was named at build/add time) the identity of
    * the corpus content the index has absorbed — queries against an
    * index whose corpus moved on can then at least warn. */
  final case class Meta(
      dim: Int,
      nlist: Int,
      centroids: Array[Array[Double]],
      m: Int,
      ksub: Int,
      codebooks: Option[Array[Array[Array[Double]]]],
      corpusDir: Option[String] = None,
      corpusHash: Option[String] = None)

  /** Train and persist the index for `corpus` at `dir`. With
    * `pq = Some((m, ksub))` the stored rows also carry PQ codes and
    * the sidecar the codebooks, enabling [[pqTopK]]. `files` pins the
    * assignment dataset's file count (default: one file per ~4 cells,
    * at least 2 — cells stay contiguous on disk either way). */
  def build(
      spark: SparkSession,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      dim: Int,
      nlist: Int = 16,
      iters: Int = 3,
      seed: Long = 11L,
      trainFraction: Double = 1.0,
      maxTrainVectors: Int = 16384,
      pq: Option[(Int, Int)] = None,
      files: Option[Int] = None,
      corpusDir: Option[String] = None): Meta = {
    val cents = Similarity.trainCentroids(corpus, idCol, vecCol, dim,
      nlist, iters, seed, trainFraction, maxTrainVectors)
    val books = pq.map { case (m, ksub) =>
      Similarity.trainPqCodebooks(corpus, idCol, vecCol, dim, m, ksub,
        iters, seed, trainFraction, maxTrainVectors)
    }
    val assigned = assign(corpus, idCol, vecCol, cents, books)
    val nFiles = files.getOrElse(math.max(2, cents.length / 4))
    assigned.write.format("graft").mode("overwrite")
      .option("index", "cell").option("files", nFiles.toString)
      .save(dir)
    val meta = Meta(dim, cents.length, cents, pq.map(_._1).getOrElse(0),
      pq.map(_._2).getOrElse(0), books,
      corpusDir, corpusDir.map(corpusFingerprint(spark, _)))
    writeIndexMeta(spark, dir, meta)
    meta
  }

  /** Cell-assign (and PQ-encode, when built with codes) through the
    * STORED geometry — shared by [[build]] and [[addVectors]], so an
    * appended batch lands exactly as the same rows would have at
    * build time. */
  private def assign(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Array[Array[Double]],
      books: Option[Array[Array[Array[Double]]]]): DataFrame = {
    val nc1 = graft.functions.VectorExpressions
      .nearestCentroids(col("vec"), cents, 1)
    val base = vectors
      .select(col(idCol).as("id"), col(vecCol).as("vec"))
      .select(element_at(nc1, 1).as("cell"), col("id"), col("vec"),
        Similarity.l2norm(col("vec")).as("norm"))
    books match {
      case Some(b) => base.withColumn("codes",
        graft.functions.VectorExpressions.pqEncode(col("vec"), b))
      case None => base
    }
  }

  private def writeIndexMeta(
      spark: SparkSession, dir: String, meta: Meta): Unit = {
    val (fs, dirPath) = GraftFs.resolve(spark, dir)
    val obj = scala.collection.immutable.ListMap(
      "dim" -> meta.dim,
      "nlist" -> meta.nlist,
      "centroids" -> meta.centroids.map(_.toVector).toVector,
      "m" -> meta.m,
      "ksub" -> meta.ksub,
      "codebooks" -> meta.codebooks
        .map(_.map(_.map(_.toVector).toVector).toVector)
        .getOrElse(Vector.empty),
      "corpus_dir" -> meta.corpusDir.getOrElse(""),
      "corpus_md5" -> meta.corpusHash.getOrElse(""))
    GraftFs.writeString(fs, new HPath(dirPath, IndexFile),
      TypedJson.write(obj))
  }

  /** Absorb NEW vectors into an existing persisted index with ZERO
    * retraining and ZERO rewriting: the stored centroids assign
    * cells, the stored codebooks (if any) encode PQ codes, and the
    * rows land through the incremental `format("graft")` append — so
    * only the new files are written and statted; pre-existing index
    * files are never read. This is the growing-corpus path the
    * persisted index exists for: cell geometry is frozen at build
    * time (exactly like a FAISS IVF add), so recall degrades only as
    * far as the corpus distribution drifts from the trained
    * centroids — rebuild when it does. Caller contract: `newVectors`
    * ids are not already in the index (the index does not dedup).
    * Passing `corpusDir` re-records the corpus content identity.
    *
    * `autoCompactOverlap = Some(n)`: each added batch lands files
    * whose CELL ranges overlap the whole index, so nprobe file
    * pruning degrades monotonically on a continuously growing index;
    * with the knob set, an add that leaves `layout_max_overlap > n`
    * is followed by [[compact]] (results pinned unchanged — layout
    * maintenance only), the same closed loop as the MinHash sink's
    * `autoReclusterOverlap`. The health check is a driver-side
    * sidecar sweep: zero jobs, safe per batch. */
  def addVectors(
      spark: SparkSession,
      newVectors: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      files: Option[Int] = None,
      corpusDir: Option[String] = None,
      autoCompactOverlap: Option[Int] = None,
      // exactly-once for streaming ingestion: an (appId, version) the
      // index's txn ledger already records makes the append a no-op
      // (the same Delta-style contract as appendToMinhashIndex)
      txn: Option[(String, Long)] = None): Meta = {
    autoCompactOverlap.foreach(n => require(n >= 1,
      s"autoCompactOverlap must be >= 1, got $n"))
    val meta = load(spark, dir)
    val assigned = assign(newVectors, idCol, vecCol, meta.centroids,
      meta.codebooks)
    val nFiles = files.getOrElse(math.max(1, meta.nlist / 8))
    val writer = assigned.write.format("graft").mode("append")
      .option("index", "cell").option("files", nFiles.toString)
    txn match {
      case Some((app, v)) => writer.option("txnAppId", app)
        .option("txnVersion", v.toString).save(dir)
      case None => writer.save(dir)
    }
    val dirOpt = corpusDir.orElse(meta.corpusDir)
    val updated = meta.copy(corpusDir = dirOpt,
      corpusHash = dirOpt.map(corpusFingerprint(spark, _)))
    writeIndexMeta(spark, dir, updated)
    autoCompactOverlap.foreach { bound =>
      if (Maintenance.layoutHealth(spark, dir).maxOverlap > bound) {
        compact(spark, dir)
        ()
      }
    }
    updated
  }

  /** Content identity of a corpus directory: the sidecar's bytes when
    * it is a graft dataset (exact — every commit rewrites them), else
    * the sorted (name, length, mtime) listing of its files. */
  /** Deletion propagation for the ANN index — the vector analogue of
    * [[Dedup.forgetDocuments]]: hide `ids`' rows with a merge-on-read
    * deletion-vector mark. The index clusters on CELL (its query
    * key), so an id delete cannot range-prune — marking costs one
    * scan of the index and zero rewrite, and every query path
    * ([[topK]]/[[pqTopK]] read `format("graft")`, which serves
    * DV-pending tables merge-on-read) stops returning the removed
    * vectors immediately. The inverse of [[addVectors]]: zero
    * retraining, cell geometry untouched; the marks fold into the
    * next [[DeletionVectors.materialize]]. `ids` is a driver-side
    * erasure list — chunk a huge one across calls. */
  def removeVectors(
      spark: SparkSession,
      dir: String,
      ids: Seq[Any]): DeletionVectors.Report = {
    require(ids.nonEmpty, "removeVectors needs at least one id")
    DeletionVectors.deleteWhere(spark, dir,
      col("id").isInCollection(ids))
  }

  /** The full ingestion decision for a batch of NEW vectors against a
    * persisted index — the vector analogue of [[Dedup.dedupBatch]]:
    * batch vectors whose cosine to an INDEXED vector reaches
    * `threshold` drop (the indexed copy wins), of batch-internal
    * near-dup pairs the smaller id wins, and the SURVIVORS — exactly
    * what should enter the index — return, ready for [[addVectors]].
    *
    * Batch-vs-index candidates come from the nprobe cell equi-join
    * ([[topK]]'s scan shape: shuffle ∝ batch + probed cells, file
    * pruning on the cell column). `nprobe = nlist` makes the gate
    * EXACT — every indexed vector is a candidate — at the cost of
    * scanning all cells' files; smaller nprobe trades recall for
    * pruning exactly as in [[topK]] (an exact duplicate always lands
    * in its original's cell, so nprobe >= 1 never misses identical
    * copies). Batch-internal pairs ride
    * [[Dedup.embeddingNearDupPairs]]' hyperplane LSH (identical
    * vectors always collide; near-identical miss with p < 4e-4).
    * Cosines round to 4 decimals before the threshold test — the
    * engine-portable convention every embedding oracle rederives. */
  def dedupVectorBatch(
      spark: SparkSession,
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      threshold: Double = 0.99,
      nprobe: Int = 4): DataFrame = {
    val meta = load(spark, dir)
    val (q, cells) = probed(batch, idCol, vecCol, meta, nprobe)
    val c = spark.read.format("graft").load(dir)
      .filter(col("cell").isin(cells.map(Integer.valueOf).toSeq: _*))
      .select(col("cell"), col("id").as("neighbor_id"),
        col("vec").as("cv"), col("norm").as("cn"))
    val vsOld = q.join(c, Seq("cell"))
      // a replayed micro-batch sees its own already-appended copies:
      // same id -> not a duplicate of itself
      .filter(col("query_id") =!= col("neighbor_id"))
      .filter(round(Similarity.cosine(
        col("__v0"), col("cv"), col("__qn"), col("cn")), 4)
        >= threshold)
      .select(col("query_id").as("__loser"))
    val vsNew = Dedup.embeddingNearDupPairs(
      batch, idCol, vecCol, threshold, meta.dim)
      .select(col("idB").as("__loser")) // idA < idB: the smaller wins
    val losers = vsOld.union(vsNew).distinct()
    // unhinted anti join: the loser set is batch-bounded, AQE's size
    // check broadcasts it when genuinely small (dedupBatch discipline)
    batch.join(losers, batch(idCol) === col("__loser"), "left_anti")
  }

  /** Re-cluster the index table. Every [[addVectors]] batch lands
    * files whose CELL ranges overlap the whole index (each batch
    * holds vectors of many cells), so after enough batches the
    * nprobe cell equi-join's file pruning degrades toward a full
    * index scan per query, and [[removeVectors]] marks pile up as
    * merge-on-read overlays. One [[Maintenance.recluster]] call
    * re-sorts the LIVE rows into disjoint cell ranges and folds the
    * deletion vectors; the centroids/codebooks sidecar (a separate
    * file) survives, so queries are unchanged — zero retraining.
    * [[Maintenance.layoutHealth]] is the scheduling signal, exactly
    * as for [[Dedup.compactMinhashIndex]]. */
  def compact(
      spark: SparkSession,
      dir: String,
      retain: Boolean = false): Maintenance.Report = {
    load(spark, dir) // fail fast when dir holds no ANN index
    Maintenance.recluster(spark, dir, retain)
  }

  def corpusFingerprint(spark: SparkSession, dir: String): String = {
    val text =
      if (graft.core.Sidecar.exists(spark, dir))
        GraftFs.readString(GraftFs.resolve(spark, dir)._1,
          graft.core.Sidecar.metadataPath(dir))
      else {
        val (fs, p) = GraftFs.resolve(spark, dir)
        GraftFs.listStatuses(fs, p).filter(_.isFile)
          .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
          .sorted.mkString("\n")
      }
    java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  /** Whether the recorded corpus has changed since the index last
    * absorbed vectors: `Some(true)` = the index is missing vectors
    * (or covering deleted ones); `None` = no corpus identity was
    * recorded at build/add time. Queries warn on drift but still
    * answer — the index is sound for the content it holds. */
  def corpusDrift(spark: SparkSession, dir: String): Option[Boolean] = {
    val meta = load(spark, dir)
    for (d <- meta.corpusDir; h <- meta.corpusHash)
      yield corpusFingerprint(spark, d) != h
  }

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private def warnOnDrift(spark: SparkSession, dir: String): Unit =
    try {
      if (corpusDrift(spark, dir).contains(true))
        log.warn(s"vector index at $dir was built from a corpus that " +
          "has since changed — results may be missing recently added " +
          "vectors; run VectorIndex.addVectors for the new rows (or " +
          "rebuild if the distribution drifted)")
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Load the trained geometry — one driver-side JSON read, no job. */
  def load(spark: SparkSession, dir: String): Meta = {
    val (fs, dirPath) = GraftFs.resolve(spark, dir)
    val obj = TypedJson.parse(
      GraftFs.readString(fs, new HPath(dirPath, IndexFile)))
      .asInstanceOf[Map[String, Any]]
    def num(v: Any): Double = v.asInstanceOf[Number].doubleValue()
    def int(k: String): Int = obj(k).asInstanceOf[Number].intValue()
    val cents = obj("centroids").asInstanceOf[Vector[Any]]
      .map(_.asInstanceOf[Vector[Any]].map(num).toArray).toArray
    val rawBooks = obj("codebooks").asInstanceOf[Vector[Any]]
    val books =
      if (rawBooks.isEmpty) None
      else Some(rawBooks.map(_.asInstanceOf[Vector[Any]]
        .map(_.asInstanceOf[Vector[Any]].map(num).toArray).toArray).toArray)
    def optStr(k: String): Option[String] =
      obj.get(k).map(_.toString).filter(_.nonEmpty)
    Meta(int("dim"), int("nlist"), cents, int("m"), int("ksub"), books,
      optStr("corpus_dir"), optStr("corpus_md5"))
  }

  /** The probed (query_id, qv, cell) frame plus the bounded distinct
    * cell list (≤ nlist values by construction — cells are centroid
    * ordinals, so this collect is index-parameter-bounded at any
    * corpus or query scale). */
  private def probed(
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      meta: Meta,
      nprobe: Int): (DataFrame, Array[Int]) = {
    val probes = math.min(nprobe, meta.centroids.length)
    val nc = graft.functions.VectorExpressions
      .nearestCentroids(col("__v0"), meta.centroids, probes)
    // Barrier select: norm + cell assignment computed once per query
    // vector, not once per candidate pair (CollapseProject).
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("__v0"))
      .select(col("query_id"), col("__v0"),
        Similarity.l2norm(col("__v0")).as("__qn"),
        explode(nc).as("cell"))
      .repartition(col("query_id"))
    val cells = q.select("cell").distinct()
      .collect().map(_.getInt(0)).sorted
    (q, cells)
  }

  /** Query the persisted index: exact cosine re-rank within the
    * probed cells (the stored-vector analogue of
    * [[Similarity.ivfTopK]] — identical output for an index built
    * with the same parameters). NO training runs here: centroids come
    * from the sidecar, candidates from a file-pruned scan of the
    * probed cells. */
  def topK(
      spark: SparkSession,
      queries: DataFrame,
      dir: String,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int = 4): DataFrame = {
    val meta = load(spark, dir)
    warnOnDrift(spark, dir)
    val (q, cells) = probed(queries, idCol, vecCol, meta, nprobe)
    // The IN filter on the sidecar's index column prunes files whose
    // cell range misses every probed cell — plan-time skipping.
    val c = spark.read.format("graft").load(dir)
      .filter(col("cell").isin(cells.map(Integer.valueOf).toSeq: _*))
      .select(col("cell"), col("id").as("neighbor_id"),
        col("vec").as("cv"), col("norm").as("cn"))
    val cands = q.join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", Similarity.cosine(
        col("__v0"), col("cv"), col("__qn"), col("cn")))
    rank(cands, k)
      .withColumn("cosine", round(col("cosine"), 4))
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Query the persisted index via the compressed codes: asymmetric
    * distance over the probed cells' stored PQ codes (the persisted
    * analogue of [[Similarity.ivfPqTopK]]). Requires the index to
    * have been built with `pq = Some((m, ksub))`. */
  def pqTopK(
      spark: SparkSession,
      queries: DataFrame,
      dir: String,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int = 4): DataFrame = {
    val meta = load(spark, dir)
    warnOnDrift(spark, dir)
    val books = meta.codebooks.getOrElse(throw new IllegalArgumentException(
      s"index at $dir was built without PQ codes; " +
        "build(..., pq = Some((m, ksub))) first"))
    val (q, cells) = probed(queries, idCol, vecCol, meta, nprobe)
    val c = spark.read.format("graft").load(dir)
      .filter(col("cell").isin(cells.map(Integer.valueOf).toSeq: _*))
      .select(col("cell"), col("id").as("neighbor_id"), col("codes"))
    val cands = q.join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("__dist", graft.functions.VectorExpressions.pqAdc(
        col("__v0"), col("codes"), books))
      .withColumn("cosine", -col("__dist")) // rank() orders desc
    rank(cands, k).select("query_id", "neighbor_id", "rank")
  }

  private def rank(cands: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cands.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
