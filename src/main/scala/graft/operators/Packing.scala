package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: concatenate a corpus in a
  * deterministic document order and split it into fixed-length token
  * sequences (the standard "pack then chunk at context boundaries"
  * layout), assigning every document its global token offset and the
  * range of training sequences it lands in.
  *
  * The global prefix sum is computed distributed, the classic
  * two-pass way (reference semantics: a plain running total over the
  * id order — e.g. numpy cumsum in single-node pipelines):
  *
  *  1. one `approxQuantile` pass over the id column places at most
  *     `buckets - 1` cut points, so the id space is bucketed evenly
  *     for ANY id distribution — dense row numbers and sparse 63-bit
  *     content hashes alike — with the bucket count bounded by
  *     construction, not by the id range;
  *  2. one narrow pass aggregates per-bucket token totals (map-side
  *     combine shuffles only one row per bucket), which are cumsum'd
  *     on the driver — a collect of at most `buckets` rows — into
  *     per-bucket base offsets and broadcast back;
  *  3. one shuffle clusters rows by bucket, where a within-bucket
  *     window adds the local running total to the bucket base.
  *
  * Total cost at any scale: three scans (quantile sketch, totals,
  * final), one data shuffle (by bucket), one broadcast of #buckets
  * rows. No global sort, no single-partition window — the two shapes
  * that stop working past a few hundred GB.
  *
  * Contract: `idCol` is numeric, unique and non-null. Bucketing by
  * binary search over quantile cuts of `CAST(id AS DOUBLE)` is
  * monotone non-decreasing in id (long→double is order-preserving up
  * to ties, and tied doubles land in one bucket), so "bucket order
  * then id order" equals global id order. Offsets are independent of
  * `buckets`; it only balances the shuffle.
  */
object Packing {

  /** Rows + `offsetCol`: total tokens in all ids strictly before this
    * one. Pure function of (id order, token counts) — bucketing does
    * not affect the result. */
  def tokenOffsets(
      df: DataFrame,
      idCol: String,
      nTokCol: String,
      offsetCol: String = "tok_offset",
      buckets: Int = 1 << 10,
      relErr: Double = 1e-4): DataFrame = {
    require(buckets >= 1 && buckets <= (1 << 16),
      s"buckets must be in [1, 65536], got $buckets " +
        "(the driver cumsum and the broadcast are #buckets rows)")
    val spark = df.sparkSession
    // Quantile-derived cut points: ~equal ROW counts per bucket
    // regardless of how ids are distributed over their range.
    val cuts: Array[Double] =
      if (buckets == 1) Array.empty
      else df.stat.approxQuantile(
        idCol, (1 until buckets).map(_.toDouble / buckets).toArray, relErr)
        .distinct.sorted
    val bkt: Column =
      if (cuts.isEmpty) lit(0)
      else Layout.bucketOf(col(idCol), cuts)
    val tagged = df.withColumn("__bkt", bkt)
    // Pass 2: per-bucket totals (≤ `buckets` rows), cumsum'd on the
    // driver.
    val totals = tagged.groupBy("__bkt")
      .agg(sum(col(nTokCol).cast("long")).as("__tot"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    var acc = 0L
    val bases = totals.map { case (b, tot) =>
      val base = acc; acc += tot; (b, base)
    }
    val baseDf = spark.createDataFrame(bases.toSeq)
      .toDF("__bkt", "__base")
    // Pass 3: bucket-local running total + broadcast bucket base.
    val w = Window.partitionBy("__bkt").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    tagged
      .join(broadcast(baseDf), "__bkt")
      .withColumn(offsetCol,
        col("__base") +
          coalesce(sum(col(nTokCol).cast("long")).over(w), lit(0L)))
      .drop("__bkt", "__base")
  }

  /** Pack into training sequences of `seqLen` tokens: each document
    * spans `[tok_offset, tok_offset + n_tokens)` of the concatenated
    * token stream, so it contributes to sequences
    * `[seq_first, seq_last]` (documents longer than `seqLen` span
    * several; zero-token documents are pinned to the sequence at
    * their offset). */
  def packSequences(
      df: DataFrame,
      idCol: String,
      nTokCol: String,
      seqLen: Int,
      buckets: Int = 1 << 10,
      // Some((textCol, model)): derive `nTokCol` as the REAL BPE
      // token count of `textCol` under a persisted tokenizer
      // ([[graft.functions.Bpe.loadModel]]) — sequences pack by
      // production token accounting instead of a whitespace proxy
      tokenizer: Option[(String, graft.functions.Bpe.BpeModel)] = None)
      : DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val base = tokenizer.fold(df) { case (textCol, model) =>
      df.withColumn(nTokCol,
        graft.functions.Bpe.bpeCount(
          org.apache.spark.sql.functions.coalesce(
            col(textCol), org.apache.spark.sql.functions.lit("")),
          model).cast("long"))
    }
    val withOff =
      tokenOffsets(base, idCol, nTokCol, buckets = buckets)
    val nt = col(nTokCol).cast("long")
    withOff
      .withColumn("__end", col("tok_offset") + greatest(nt, lit(1L)) - 1)
      .withColumn("seq_first", expr(s"tok_offset div $seqLen"))
      .withColumn("seq_last", expr(s"__end div $seqLen"))
      .withColumn("n_seqs", col("seq_last") - col("seq_first") + 1)
      .drop("__end")
  }
}
