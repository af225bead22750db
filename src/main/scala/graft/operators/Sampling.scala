package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data
  * pipelines.
  *
  * The keep/drop decision is a pure function of the row's id (an
  * md5-derived uniform fraction), so it is reproducible across runs,
  * engines and partitionings — unlike `DataFrame.sample`, whose output
  * depends on partition layout. Each row decides independently in one
  * narrow scan: no shuffle, no per-stratum groupBy, which is the only
  * shape that survives 100 TB (a true exact quota would need a global
  * count/sort per stratum; at corpus scale the hash fraction's
  * concentration makes the realized rate indistinguishable from the
  * target).
  */
object Sampling {

  /** Uniform [0, 1) fraction derived from the first 32 md5 bits of the
    * id's decimal string — md5 (not xxhash64) so the same decision is
    * reproducible in any engine with md5 (reference: the DuckDB
    * oracle rederives it exactly). */
  def hashFraction(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)

  /** Uniform deterministic sample: keep iff hashFraction(id) < p. */
  def deterministicSample(df: DataFrame, idCol: String, p: Double): DataFrame =
    df.filter(hashFraction(col(idCol)) < lit(p))

  /** Per-group quota cap: keep at most `maxPerGroup` rows per value
    * of `groupCol` (e.g. cap documents per domain so no source
    * dominates the corpus), chosen deterministically by md5 order of
    * the id — reproducible across runs, engines and partitionings,
    * unlike "first N seen". One shuffle on the group key. For
    * `maxPerGroup` at or under
    * `spark.sql.optimizer.windowGroupLimitThreshold` (default 1000)
    * Spark plans a WindowGroupLimit that caps every group at
    * maxPerGroup rows PER MAP TASK before the exchange (PlanSpec
    * pins it), so even a mega-group ships at most maxPerGroup ×
    * tasks rows. The operator REFUSES when that map-side cap cannot
    * fire (quota above the threshold, or the rewrite disabled): a
    * silently un-capped hot domain would sort in full on one reducer
    * at corpus scale — raise the threshold alongside very large
    * quotas instead. Groups at or under quota pass through whole. */
  def quotaCap(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      maxPerGroup: Int): DataFrame = {
    require(maxPerGroup >= 1, s"maxPerGroup must be positive, got $maxPerGroup")
    val threshold = df.sparkSession.conf
      .get("spark.sql.optimizer.windowGroupLimitThreshold", "1000").toInt
    require(threshold >= 0 && maxPerGroup <= threshold,
      s"quotaCap($maxPerGroup) exceeds " +
        s"spark.sql.optimizer.windowGroupLimitThreshold=$threshold, so " +
        "Spark cannot cap groups map-side and a hot group would sort " +
        "in full on one reducer; SET the threshold to at least " +
        s"$maxPerGroup for this session")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPerGroup)
      .drop("__rn")
  }

  /** Temperature-flattened source mixture: downsample each source so
    * the corpus' source distribution follows `n^alpha` — the standard
    * flattening for multi-source/multilingual training mixes.
    * Per-source keep fraction `f_s = (n_min / n_s)^(1-alpha)`:
    * `alpha = 1` keeps the natural mix untouched, `alpha = 0`
    * equalizes every source down to the smallest, values between
    * interpolate (the expected kept size per source is
    * `n_s^alpha * n_min^(1-alpha)`).
    *
    * Plan: one count aggregate (rows = #sources, broadcast back) and
    * the usual narrow hash-fraction filter — no driver collect, no
    * extra shuffle of the data. `alpha = 0.5` computes the fraction
    * with `sqrt`, which IEEE 754 rounds exactly, so the keep decision
    * is bit-reproducible across engines (the DuckDB oracle rederives
    * it); other alphas go through `pow`, whose last-ulp rounding is
    * libm-specific. */
  def mixtureByTemperature(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      alpha: Double): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha in [0,1], got $alpha")
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("__n"))
    val nmin = counts.agg(min(col("__n")).as("__nmin"))
    val ratio = col("__nmin").cast("double") / col("__n").cast("double")
    val frac = if (alpha == 0.5) sqrt(ratio) else pow(ratio, 1.0 - alpha)
    // counts is one row per DISTINCT source — unhinted so AQE's size
    // check governs (a high-cardinality source column must not OOM a
    // forced broadcast); nmin is ONE row, bounded by construction
    df.join(counts, sourceCol)
      .crossJoin(broadcast(nmin))
      .filter(hashFraction(col(idCol)) < frac)
      .drop("__n", "__nmin")
  }

  /** Deterministic shard assignment: a reproducible global shuffle of
    * the corpus into `numShards` training shards. The shard is the
    * first 32 md5 bits of `"seed:id"` mod `numShards`; the position
    * is the rank of that same hash within the shard (ties broken by
    * id) — a pure function of (seed, id), so re-runs, re-partitioning
    * and other engines produce the same shards in the same order, and
    * changing the seed is a fresh epoch-level reshuffle.
    *
    * One shuffle on the shard id; each shard ranks on one reducer, so
    * pick `numShards` to make a shard file-sized (thousands of shards
    * at corpus scale) — which is exactly the layout written out as
    * one output file per shard. */
  def shardAssign(
      df: DataFrame,
      idCol: String,
      numShards: Int,
      seed: String): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    df.withColumn("__h", shardHash(idCol, seed))
      .withColumn("shard", shardOf(col("__h"), numShards))
      .withColumn("shard_pos", row_number().over(w).cast("long"))
      .drop("__h")
  }

  private def shardHash(idCol: String, seed: String): Column =
    md5(concat_ws(":", lit(seed), col(idCol).cast("string")))

  private def shardOf(h: Column, numShards: Int): Column =
    pmod(conv(substring(h, 1, 8), 16, 10).cast("long"),
      lit(numShards.toLong)).cast("int")

  /** Deterministic train/validation/test split: each row lands in
    * exactly one named split, chosen by where its seeded md5 fraction
    * falls among the cumulative (normalized) weights — a pure
    * function of (seed, id), so membership is stable across runs,
    * partitionings and engines, and changing the seed redraws the
    * split. One narrow scan, no shuffle; realized sizes concentrate
    * on the weights at corpus scale. */
  def splitAssign(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Double)],
      seed: String): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "splits need positive weights")
    val total = splits.map(_._2).sum
    val cuts = splits.map(_._2 / total).scanLeft(0.0)(_ + _).tail
    val f = hashFraction(concat_ws(":", lit(seed), col(idCol).cast("string")))
    // last split catches the remainder so float edges can't drop rows
    val assign = splits.init.zip(cuts.init).reverse.foldLeft(
      lit(splits.last._1): Column) {
      case (acc, ((name, _), cut)) => when(f < lit(cut), lit(name))
        .otherwise(acc)
    }
    df.withColumn("split", assign)
  }

  /** Materialize [[shardAssign]]: write the corpus as `numShards`
    * training shards under `dir/shard=N/`, each shard ONE parquet
    * file with rows in their deterministic in-shard order — the
    * layout a training loader consumes directly, reproducible
    * end-to-end from (seed, ids). One shuffle on the shard id; each
    * shard sorts and writes in its own task, so size `numShards` to
    * file-sized shards.
    *
    * Mega-shard guard (default ON): because each shard ranks, sorts
    * and writes on ONE task, an under-sized `numShards` on a huge
    * corpus silently creates reducer-killing shards — before writing,
    * one cheap count aggregate (numShards result rows) verifies no
    * shard exceeds `maxShardRows` and fails loudly with the offending
    * shard and a suggested `numShards` otherwise. Pass
    * `maxShardRows = 0` to opt out. */
  def writeShards(
      df: DataFrame,
      idCol: String,
      numShards: Int,
      seed: String,
      dir: String,
      maxShardRows: Long = 1L << 25): Unit = {
    if (maxShardRows > 0) assertShardBound(
      df.select(shardOf(shardHash(idCol, seed), numShards).as("shard")),
      maxShardRows)
    shardAssign(df, idCol, numShards, seed)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shard_pos"))
      .write.partitionBy("shard").mode("overwrite").parquet(dir)
  }

  /** The loud mega-shard check: hash-partitioned md5 assignment is
    * near-uniform, so rows/numShards predicts every shard's size —
    * the failure message solves `totalRows / numShards ≤ maxShardRows`
    * for the numShards the caller should have used. One count
    * aggregate over the shard column alone (a narrow scan + map-side
    * combine); the ranking window and sort never run on an offending
    * layout. */
  private def assertShardBound(
      assigned: DataFrame, maxShardRows: Long): Unit = {
    val counts = assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("__n"))
      .agg(sum(col("__n")).as("__total"), max(col("__n")).as("__max"),
        max_by(col("shard"), col("__n")).as("__worst"))
      .collect()(0)
    if (!counts.isNullAt(1) && counts.getLong(1) > maxShardRows) {
      val total = counts.getLong(0)
      val suggested = ((total + maxShardRows - 1) / maxShardRows).max(1)
      throw new IllegalArgumentException(
        s"shard ${counts.getInt(2)} would hold ${counts.getLong(1)} rows " +
          s"(> maxShardRows=$maxShardRows) and rank/sort/write on ONE " +
          s"task; use numShards >= $suggested for these $total rows, " +
          "or maxShardRows = 0 to opt out")
    }
  }

  /** Per-source TOKEN-budget sampling: keep, for every source,
    * documents in deterministic md5 order until the source has
    * contributed `budget` weight (tokens, chars, bytes — whatever
    * `weightCol` counts) — the standard way a training mixture is
    * specified ("100B tokens of web, 20B of code"), where a row-count
    * quota would over-represent short documents.
    *
    * Fill semantics: a source's documents are ordered by
    * `(md5(id), id)` and kept while the budget was not yet exhausted
    * when the document STARTS (`cumsum - weight < budget`), so the
    * boundary-crossing document is included and a positive budget
    * always yields at least one document per source. Membership is a
    * pure function of the ids — reproducible across runs, engines and
    * partitionings.
    *
    * Scale shape: one small per-source total aggregate (joined back —
    * AQE broadcasts it whenever it fits), then
    *   - sources whose total fits the budget pass through WHOLE with
    *     no shuffle at all (the common long tail);
    *   - over-budget sources first drop to a deterministic
    *     hash-fraction candidate set of ~`oversample × budget`
    *     expected weight, and only the candidates enter the
    *     cumulative-sum fill. The candidate volume per source is
    *     bounded by the BUDGET, not the corpus — a 50 TB source with
    *     a 10 GB budget fills over ~20 GB — and the fill itself is
    *     BUCKETED ([[Packing.tokenOffsets]]' two-pass prefix-sum
    *     shape): candidates bucket by the first two hex chars of
    *     their md5 order key (256 buckets — a prefix of the order
    *     key, so bucket order then in-bucket order IS the per-source
    *     fill order), per-bucket weight totals cumsum into per-bucket
    *     bases over ≤256 aggregated rows per source, whole buckets
    *     past the budget boundary drop before any row-level work, and
    *     the row-level window runs per (source, bucket) — ~1/256 of
    *     the candidate set per task instead of the whole candidate
    *     set through ONE task, which is what makes the
    *     sequential-by-nature prefix sum survive 100 TB budgets.
    *     Bucket composition is exact for integral weights (token /
    *     char / byte counts — the norm); fractional weights would
    *     re-associate the floating-point sum.
    * The prefilter is part of the operator's definition (the fill
    * runs over the candidate set), so the oracle rederives it
    * exactly; expected candidate weight `oversample × budget` makes
    * under-fill vanishingly unlikely for `oversample ≥ 2`. Rows with
    * NULL weight in an over-budget source drop (their cumulative sum
    * is undefined — SQL three-valued logic, identical in any engine). */
  def sampleByTokenBudget(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      weightCol: String,
      budget: Long,
      oversample: Double = 2.0,
      // real mixtures give each source its own quota ("100B web, 20B
      // code"): explicit per-source budgets, `budget` the default
      perSource: Map[String, Long] = Map.empty,
      // Some((textCol, model)): derive `weightCol` as the REAL BPE
      // token count of `textCol` under a persisted tokenizer
      // ([[graft.functions.Bpe.loadModel]]) instead of expecting a
      // precomputed count — production token accounting without a
      // separate pass. The expression is narrow (per-row kernel);
      // callers re-sampling many budgets should still materialize
      // the count once.
      tokenizer: Option[(String, graft.functions.Bpe.BpeModel)] = None)
      : DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(perSource.values.forall(_ > 0),
      "per-source budgets must be positive")
    require(oversample >= 1.0, s"oversample must be >= 1, got $oversample")
    if (tokenizer.isDefined) {
      val (textCol, model) = tokenizer.get
      return sampleByTokenBudget(
        df.withColumn(weightCol,
          graft.functions.Bpe.bpeCount(
            coalesce(col(textCol), lit("")), model).cast("long")),
        sourceCol, idCol, weightCol, budget, oversample, perSource)
    }
    val budgetOf: Column =
      if (perSource.isEmpty) lit(budget)
      else coalesce(element_at(typedLit(perSource), col(sourceCol)),
        lit(budget))
    val totals = df.groupBy(col(sourceCol))
      .agg(sum(col(weightCol)).cast("long").as("__tot"))
    // unhinted: one row per DISTINCT source — tiny for a mixture spec,
    // but a caller passing a high-cardinality column (domain as
    // source) must not OOM on a forced broadcast; AQE's runtime size
    // check picks the broadcast whenever it genuinely fits
    val joined = df.join(totals, Seq(sourceCol))
      .withColumn("__budget", budgetOf)
    val under = joined.filter(col("__tot") <= col("__budget"))
      .drop("__tot", "__budget")
    val keepRate = least(lit(1.0),
      lit(oversample) * col("__budget").cast("double") /
        col("__tot").cast("double"))
    // md5 hex is lowercase [0-9a-f]: its string order is its numeric
    // order, so the two-char prefix buckets are contiguous runs of
    // the (md5, id) fill order
    val orderKey = md5(col(idCol).cast("string"))
    val cand = joined.filter(col("__tot") > col("__budget"))
      .filter(hashFraction(col(idCol)) < keepRate)
      .withColumn("__bkt", substring(orderKey, 1, 2))
    // per-bucket bases: one map-side-combined aggregate (≤256 rows
    // per over-budget source), cumsum'd by a window over those
    // aggregated rows — never over data
    val baseW = Window.partitionBy(col(sourceCol)).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = cand.groupBy(col(sourceCol), col("__bkt"))
      .agg(sum(col(weightCol)).as("__bt"))
      .withColumn("__base", coalesce(sum(col("__bt")).over(baseW), lit(0L)))
      .drop("__bt")
    // row-level running sum only within (source, bucket); buckets
    // whose base already exhausts the budget never reach it (every
    // row there starts at cum - weight >= base >= budget)
    val w = Window.partitionBy(col(sourceCol), col("__bkt"))
      .orderBy(orderKey, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val over = cand
      .join(bases, Seq(sourceCol, "__bkt"))
      .filter(col("__base") < col("__budget"))
      .withColumn("__cum", col("__base") + sum(col(weightCol)).over(w))
      .filter(col("__cum") - col(weightCol) < col("__budget"))
      .drop("__cum", "__base", "__bkt", "__tot", "__budget")
    under.unionByName(over)
  }

  /** Stratified deterministic sample: each stratum keeps its own
    * fraction (e.g. per-language quotas when balancing a multilingual
    * corpus); strata not listed keep `defaultFraction`. */
  def stratifiedSample(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double): DataFrame = {
    val frac = fractions.foldLeft(lit(defaultFraction): Column) {
      case (acc, (stratum, p)) =>
        when(col(stratumCol) === lit(stratum), lit(p)).otherwise(acc)
    }
    df.filter(hashFraction(col(idCol)) < frac)
  }
}
