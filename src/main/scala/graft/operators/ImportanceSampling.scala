package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{SketchExpressions, TextFunctions}

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): pick, from a huge RAW corpus, the documents
  * whose hashed n-gram feature distribution looks like a small TARGET
  * corpus (the domain you want more of), by importance resampling
  * with Gumbel top-k. The engine-portable distributed analogue built
  * on [[LanguageModel]]'s bounded trigram models:
  *
  *   - `log w(doc) = Σ_t [log2 p_target(t) − log2 p_raw(t)]` over the
  *     document's trigrams (the paper's bag-of-hashed-ngrams
  *     importance weight), both models add-one smoothed and truncated
  *     to `vocab` grams with the deterministic count-desc/hash-asc
  *     tie-break;
  *   - resampling key = `ln w + Gumbel(u)` (the base-2 log weight
  *     scaled by ln 2 so weight and noise share the natural-log
  *     base — the draw is then ∝ w exactly) with
  *     `u = (md5₃₂(id) + 0.5) / 2³²` ∈ (0,1) strictly — the Gumbel
  *     top-k trick samples WITHOUT replacement ∝ w, and deriving `u`
  *     from the id makes the draw a pure function of (corpus, ids):
  *     reproducible across runs, engines and partitionings;
  *   - selection = top-`k` keys.
  *
  * Scale shape: two bounded-model training aggregates (one over the
  * target — small by definition — one over the raw corpus), then ONE
  * pass over the raw corpus's grams with two AQE-sized model joins
  * and a per-document sum, and a TakeOrdered top-k (per-partition
  * heaps, no global sort materialization). Nothing scales with the
  * corpus except the unavoidable gram scan.
  */
object ImportanceSampling {

  /** Select the `k` raw documents most target-like under DSIR.
    * Returns (idCol, importance) — `importance` is the rounded
    * log-weight, the selection key before Gumbel noise. */
  def dsirSelect(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      vocab: Int = 1 << 16): DataFrame =
    dsirSelectWithModels(raw,
      LanguageModel.trainTrigramModel(target, textCol, vocab),
      LanguageModel.trainTrigramModel(raw, textCol, vocab),
      idCol, textCol, k)

  /** [[dsirSelect]] with PRETRAINED trigram models (the
    * [[LanguageModel.trainTrigramModel]] output, typically persisted
    * as parquet) — the production shape: models are deterministic,
    * bounded, read-only artifacts trained once per (corpus, target)
    * pair and reused across every selection run, so re-selection
    * pays one gram scan, never re-training. */
  def dsirSelectWithModels(
      raw: DataFrame,
      targetModel: DataFrame,
      rawModel: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    // Materialize each bounded model ONCE (the [[LanguageModel.lmScore]]
    // discipline): one collect feeds both the driver-side denominator
    // and an unconditionally-broadcast local join relation, instead of
    // re-executing the model plan for the aggregate and again for the
    // join and leaving the broadcast to AQE's estimate.
    val spark = raw.sparkSession
    def localize(m: DataFrame, cntName: String): (DataFrame, Double) = {
      val rows = m.select(col("gram").cast("long"),
        col("cnt").cast("long")).collect()
      var t = 0L
      rows.foreach(r => t += r.getLong(1))
      val df = broadcast(spark.createDataFrame(
        java.util.Arrays.asList(rows: _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("gram",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField(cntName,
            org.apache.spark.sql.types.LongType)))))
      (df, (t + rows.length + 1).toDouble)
    }
    val (pt, dT) = localize(targetModel, "__ct")
    val (pr, dR) = localize(rawModel, "__cr")
    // per-gram contribution: log2((ct+1)/dT) − log2((cr+1)/dR)
    //   = log2(ct+1) − log2(cr+1) + [log2(dR) − log2(dT)]
    // the constant rides per-gram (n × const overall), exactly as in
    // the paper's sum over the document's features
    val const = math.log(dR) / math.log(2.0) -
      math.log(dT) / math.log(2.0)
    val grams = raw.select(col(idCol),
      explode(SketchExpressions.charGramHash64(
        TextFunctions.normText(col(textCol)), 3, shift = 2)).as("gram"))
    val logw = grams
      .join(pt, Seq("gram"), "left")
      .join(pr, Seq("gram"), "left")
      .groupBy(idCol)
      .agg((sum(log2(coalesce(col("__ct"), lit(0L)) + lit(1L)) -
          log2(coalesce(col("__cr"), lit(0L)) + lit(1L))) +
        count(lit(1)) * lit(const)).as("__logw"))
    // Gumbel(u) with u strictly inside (0,1): the +0.5 keeps both
    // log endpoints finite in every engine
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    // The Gumbel noise -ln(-ln u) is natural-log scale, so the weight
    // must be too: __logw is base-2, scale by ln 2 before adding noise
    // (otherwise the draw is ∝ w^(1/ln 2), not ∝ w).
    logw
      .withColumn("__key",
        col("__logw") * lit(math.log(2.0)) - log(-log(u)))
      .orderBy(col("__key").desc, col(idCol))
      .limit(k)
      .select(col(idCol), round(col("__logw"), 4).as("importance"))
  }
}
