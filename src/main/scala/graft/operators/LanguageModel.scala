package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{SketchExpressions, TextFunctions}

/** CCNet-style n-gram LM quality scoring (Wenzek et al. 2020,
  * arXiv:1911.00359 §4.3 score documents with a KenLM 5-gram model
  * and keep the low-perplexity band; this is the engine-portable
  * distributed analogue): a character-trigram unigram model trained
  * on a REFERENCE corpus, each document scored by its mean negative
  * log2 trigram probability under add-one smoothing. Reference-like
  * text scores LOW, gibberish/off-distribution text scores HIGH, and
  * the standard quality band composes as a plain range predicate on
  * the score — `lmScore(...)` then `filter($"lm_score" < cut)`.
  *
  * Scale shape: training is ONE map-side-combined aggregate keyed on
  * the 62-bit md5-prefix hash of the gram (8 fixed bytes into the
  * shuffle, never the text — the [[Dedup.exactDedup]] identity
  * discipline; the gram kernel is [[SketchExpressions.charGramHash64]]
  * — one codegen pass per document, the winnowing stage reused),
  * truncated to the `vocab` most frequent grams with a DETERMINISTIC
  * tie-break (count desc, hash asc). The model is therefore bounded —
  * KB-to-MB scale regardless of corpus size, exactly like the fixed
  * KenLM binary CCNet ships — so the scoring join broadcasts under
  * AQE's size check (unhinted), and scoring is one explode + join +
  * per-document mean: shuffle ∝ the corpus's gram count, the
  * unavoidable lower bound. Scores round to 4 decimals and the whole
  * pipeline rederives bit-identically in ANSI SQL (md5, log2 and the
  * order-by truncation are all engine-portable).
  */
object LanguageModel {

  /** Train the trigram model on `ref`: the `vocab` most frequent
    * character-trigram hashes of [[TextFunctions.normText]]'d text,
    * as (gram, cnt). Ties at the truncation boundary break on the
    * hash, so the model is a pure function of the corpus. */
  def trainTrigramModel(
      ref: DataFrame,
      textCol: String,
      vocab: Int = 1 << 16): DataFrame = {
    require(vocab >= 1, s"vocab must be positive, got $vocab")
    ref.select(explode(SketchExpressions.charGramHash64(
        TextFunctions.normText(col(textCol)), 3, shift = 2)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram"))
      .limit(vocab)
  }

  /** Score every document against a trained model: mean
    * `-log2((cnt(gram) + 1) / D)` over the document's trigrams, with
    * `D = Σ model counts + |model| + 1` (add-one smoothing; grams
    * outside the model contribute the smoothed floor). Computed as
    * `log2(D) - avg(log2(cnt + 1))` — out-of-model grams contribute
    * an EXACT zero to the mean, so only in-model grams touch floating
    * point before the final 4-decimal round. Every document scores
    * (an empty text hashes its one empty gram, the charGramHash64
    * contract), so the output has one row per input document. */
  def lmScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: DataFrame,
      scoreCol: String = "lm_score"): DataFrame = {
    // Materialize the model ONCE: it is vocab-bounded by contract
    // (KB-to-MB, like the fixed KenLM binary), so collect it and
    // re-plan it as a local relation. Passing `model` through twice —
    // the denominator aggregate and the scoring join — re-executed
    // the whole model plan per consumer (for [[lmScoreSelf]] that
    // re-ran training, a full gram aggregate over the corpus), and
    // left the join's broadcast to AQE's estimate. The local relation
    // computes the denominator driver-side for free and broadcasts
    // unconditionally.
    val spark = docs.sparkSession
    val rows = model.select(col("gram").cast("long"),
      col("cnt").cast("long")).collect()
    var t = 0L
    rows.foreach(r => t += r.getLong(1))
    val d = (t + rows.length + 1).toDouble
    val localModel = broadcast(spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("gram",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cnt",
          org.apache.spark.sql.types.LongType)))))
    docs.select(col(idCol),
        explode(SketchExpressions.charGramHash64(
          TextFunctions.normText(col(textCol)), 3, shift = 2)).as("gram"))
      .join(localModel, Seq("gram"), "left")
      .groupBy(idCol)
      .agg(round(
        log2(lit(d)) - avg(log2(coalesce(col("cnt"), lit(0L)) + lit(1L))),
        4).as(scoreCol))
  }

  /** The common self-scoring shape: train on the corpus, score the
    * corpus — documents far from the corpus's own distribution
    * surface with high scores (the CCNet "tail" band). */
  def lmScoreSelf(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocab: Int = 1 << 16): DataFrame =
    lmScore(docs, idCol, textCol,
      trainTrigramModel(docs, textCol, vocab))
}
