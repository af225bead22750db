package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media (image/audio/video) ride through
  * the engine as opaque `binary` columns with typed metadata structs.
  *
  * The Spark-side mechanics here are real and tested — schema contract,
  * per-partition batched processing, deterministic partitioning — while
  * the actual codec work is STUBBED (this environment has no image or
  * audio libraries): [[decodeStub]] derives deterministic fake features
  * from the bytes. Swapping in a real decoder means replacing only the
  * `decodeBytes` function inside the mapPartitions; the surrounding
  * plumbing (batch iteration, schema, partition layout) is unchanged.
  */
object Multimodal {

  /** Wrap a text column as a fake binary payload with extraction
    * metadata — the shape a real media ingest would produce. */
  def attachPayload(df: DataFrame, idCol: String, srcCol: String): DataFrame =
    df.select(
      col(idCol),
      to_binary(col(srcCol), lit("utf-8")).as("payload"),
      struct(
        octet_length(to_binary(col(srcCol), lit("utf-8"))).as("n_bytes"),
        md5(col(srcCol)).as("checksum"),
        lit("application/octet-stream").as("mime")).as("media_meta"))

  val featureSchema: StructType = StructType(Seq(
    StructField("n_bytes", IntegerType),
    StructField("mean_byte", DoubleType),
    StructField("max_byte", IntegerType),
    StructField("head_hex", StringType)))

  /** STUB decoder: deterministic per-row "features" from the raw bytes
    * (byte statistics standing in for decode/resize/frame-sample).
    * Runs batched per partition via mapPartitions — the executor-side
    * shape a real codec (JNI image lib, ffmpeg pipe) needs: one
    * initialization per partition, streaming row iteration, no
    * per-row driver round-trips.
    */
  def decodeStub(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val idIdx = inSchema.fieldIndex(idCol)
    val payloadIdx = inSchema.fieldIndex("payload")
    val outSchema = StructType(
      inSchema(idIdx) +: featureSchema.fields.toSeq)
    val out = df.rdd.mapPartitions { it =>
      // per-partition init happens here (codec handles, model weights...)
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](payloadIdx)
        val feats = decodeBytes(bytes)
        Row.fromSeq(row.get(idIdx) +: feats)
      }
    }
    spark.createDataFrame(out, outSchema)
  }

  /** Frame sampling plumbing: split the payload into fixed-width byte
    * frames and keep every `stride`-th — the decode-independent half
    * of video/audio frame extraction, entirely as codegen built-ins
    * (one narrow explode, fan-out bounded by payload size / frame /
    * stride). A real codec swaps byte slicing for time-indexed decode;
    * the schema contract (id, frame_idx, frame payload + stats) and
    * partition layout stay. */
  def frameSample(
      df: DataFrame,
      idCol: String,
      frameBytes: Int = 32,
      stride: Int = 4): DataFrame = {
    require(frameBytes > 0 && stride > 0,
      "frameBytes and stride must be positive")
    val nFrames =
      ceil(octet_length(col("payload")).cast("double") / frameBytes)
        .cast("int")
    def frameAt(i: Column, len: Int) =
      col("payload").substr(i * frameBytes + 1, lit(len))
    df.select(col(idCol), col("payload"), nFrames.as("__nf"))
      .withColumn("frame_idx",
        explode(when(col("__nf") > 0,
          sequence(lit(0), col("__nf") - 1, lit(stride)))
          .otherwise(array().cast("array<int>"))))
      .select(
        col(idCol),
        col("frame_idx"),
        octet_length(frameAt(col("frame_idx"), frameBytes)).as("frame_bytes"),
        lower(hex(frameAt(col("frame_idx"), 4))).as("head_hex"),
        frameAt(col("frame_idx"), frameBytes).as("frame"))
  }

  /** The seam a real decoder replaces. Deterministic byte stats. */
  private def decodeBytes(bytes: Array[Byte]): Seq[Any] = {
    if (bytes == null || bytes.isEmpty) Seq(0, 0.0, 0, "")
    else {
      var sum = 0L
      var mx = 0
      bytes.foreach { b =>
        val u = b & 0xff
        sum += u
        if (u > mx) mx = u
      }
      val head = bytes.take(8).map(b => f"${b & 0xff}%02x").mkString
      Seq(bytes.length, sum.toDouble / bytes.length, mx, head)
    }
  }
}
