package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window document chunking: split each document into
  * overlapping fixed-size character chunks, each carrying its id and
  * offset for traceability back to the source document.
  *
  * Shape: one narrow projection + explode — no shuffle, no UDF (the
  * start offsets come from `sequence` and the slice from `substr`,
  * both codegen). Row blowup is bounded by construction at
  * ceil(len / (chunkChars - overlap)) chunks per document, and an
  * empty document yields exactly one empty chunk (a document is
  * never silently dropped). The trailing chunk is shorter rather
  * than padded.
  */
object Chunking {

  /** Explode `textCol` into chunks of `chunkChars` characters
    * overlapping by `overlap`. Adds `chunk_id` (0-based per
    * document), `chunk_start` (0-based char offset) and `chunk`;
    * other columns pass through. */
  def chunk(
      df: DataFrame,
      textCol: String,
      chunkChars: Int,
      overlap: Int): DataFrame = {
    require(chunkChars > 0 && overlap >= 0 && overlap < chunkChars,
      s"need 0 <= overlap < chunkChars, got overlap=$overlap chunkChars=$chunkChars")
    val step = chunkChars - overlap
    df
      .withColumn("chunk_start",
        explode(sequence(lit(0),
          greatest(length(col(textCol)) - 1, lit(0)), lit(step))))
      .withColumn("chunk_id", (col("chunk_start") / step).cast("int"))
      .withColumn("chunk",
        col(textCol).substr(col("chunk_start") + lit(1), lit(chunkChars)))
  }
}
