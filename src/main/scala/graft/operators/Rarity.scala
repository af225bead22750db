package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document rarity against the corpus's own unigram statistics — the
  * integer core of frequency-based quality signals: a document whose
  * tokens all have corpus count 1 is OCR junk or another corpus's
  * language; one whose average token frequency is enormous is
  * boilerplate. Emitting exact integer aggregates (token count, sum
  * and min of per-token corpus counts) instead of a log-probability
  * keeps the result bit-identical across engines — callers derive
  * their float score (e.g. mean log frequency) from these.
  *
  * Shape: one narrow tokenize+explode, one partial-agg shuffle for
  * the unigram counts, one shuffle join tokens↔counts (AQE broadcasts
  * the counts side when the vocabulary is small and skew-splits the
  * stopword keys when it isn't), one partial-agg shuffle back to
  * documents. No driver-side vocabulary, no UDF — `split`/`explode`
  * and hash aggregates all stay in codegen.
  */
object Rarity {

  /** Per-document exact token-frequency stats over whitespace tokens:
    * `n_tokens`, `sum_tok_freq` (sum over tokens of that token's
    * corpus count), `min_tok_freq`. Documents with no tokens are
    * absent from the output. */
  def tokenRarity(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df
      .select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("tok_n"))
    toks.join(counts, "tok")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_tokens"),
        sum("tok_n").as("sum_tok_freq"),
        min("tok_n").as("min_tok_freq"))
  }
}
