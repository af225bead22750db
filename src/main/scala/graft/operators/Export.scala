package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style corpus export: the corpus written as N tar shards
  * (`shard-#####.tar`, one member per document), the layout
  * sequential training loaders consume directly — members stream in
  * a deterministic shuffled order, shards are file-sized units of
  * work, and the whole export is reproducible bit-for-bit from
  * `(seed, ids)`.
  *
  * Scale shape: shard assignment and in-shard order are
  * [[Sampling.shardAssign]]'s pure-hash permutation (no global sort),
  * one shuffle routes documents to their shard, and each task streams
  * its shard(s) straight to the target filesystem — no driver
  * involvement, no whole-shard buffering (one member at a time).
  * Pick `numShards` to make a shard file-sized: thousands of shards
  * at corpus scale, exactly how WebDataset is deployed.
  *
  * Format: plain USTAR — 512-byte headers, octal size, standard
  * checksum, `ustar` magic, two zero blocks at the end — readable by
  * any tar implementation. Member names are `<id>.txt`, member bytes
  * the document's UTF-8 text. All timestamps are zero so a re-export
  * is BYTE-identical (determinism over provenance theater).
  */
object Export {

  private val Block = 512

  /** Write `df` as `numShards` tar shards under `dir`. Returns the
    * number of shards written (shards that received no documents
    * write no file). */
  def writeTarShards(
      df: DataFrame,
      idCol: String,
      textCol: String,
      dir: String,
      numShards: Int,
      seed: String): Int = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val spark = df.sparkSession
    val assigned = Sampling.shardAssign(
      df.select(col(idCol).cast("string").as("__id"),
        col(textCol).as("__text")), "__id", numShards, seed)
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val out = dir
    // hash-repartition on the shard id co-locates each shard's
    // members; a task may receive several whole shards (hash
    // collisions) — the sorted stream rolls to a new tar per shard
    val written = assigned
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shard_pos"))
      .select(col("shard"), col("__id"), col("__text"))
      .mapPartitions { it =>
        import org.apache.hadoop.fs.Path
        var current = -1
        var os: java.io.OutputStream = null
        var count = 0
        def close(): Unit = if (os != null) {
          os.write(new Array[Byte](2 * Block)) // end-of-archive
          os.close()
          os = null
          count += 1
        }
        it.foreach { row =>
          val shard = row.getInt(0)
          if (shard != current) {
            close()
            current = shard
            val p = new Path(out, f"shard-$shard%05d.tar")
            os = p.getFileSystem(conf.value).create(p, true)
          }
          writeMember(os, row.getString(1) + ".txt",
            row.getString(2).getBytes("UTF-8"))
        }
        close()
        Iterator.single(count)
      }(org.apache.spark.sql.Encoders.scalaInt)
      .reduce(_ + _)
    written
  }

  /** Read tar shards back as `(shard, name, text)` — one row per
    * member. Each shard parses in one task from one whole-file read
    * (shards are file-sized by construction; Spark's binaryFile
    * source caps a file at 2 GB — size `numShards` well below that,
    * as WebDataset deployments do anyway); any USTAR/GNU tar works,
    * not just [[writeTarShards]]' output. */
  def readTarShards(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(s"$dir/*.tar")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val shard = "shard-(\\d+)\\.tar".r.findFirstMatchIn(path)
          .map(_.group(1).toInt).getOrElse(-1)
        parseTar(bytes).map { case (name, data) =>
          (shard, name, new String(data, "UTF-8"))
        }
      }
      .toDF("shard", "name", "text")
  }

  /** One USTAR member: header block + data padded to the block size. */
  private[graft] def writeMember(
      os: java.io.OutputStream, name: String, data: Array[Byte]): Unit = {
    require(name.getBytes("UTF-8").length <= 100,
      s"tar member name over 100 bytes: $name")
    val h = new Array[Byte](Block)
    def put(s: String, off: Int): Unit = {
      val b = s.getBytes("UTF-8")
      System.arraycopy(b, 0, h, off, b.length)
    }
    def oct(v: Long, off: Int, len: Int): Unit =
      // len-1 octal digits, NUL-terminated (the common tar spelling)
      put(("%0" + (len - 1) + "o").format(v), off)
    put(name, 0)
    oct(420, 100, 8) // mode 0644
    oct(0, 108, 8) // uid
    oct(0, 116, 8) // gid
    oct(data.length.toLong, 124, 12)
    oct(0, 136, 12) // mtime 0: byte-identical re-exports
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // checksum spaces
    h(156) = '0' // regular file
    put("ustar", 257)
    h(262) = 0
    put("00", 263)
    val sum = h.foldLeft(0L)((a, b) => a + (b & 0xff))
    put("%06o".format(sum), 148)
    h(154) = 0
    h(155) = ' '
    os.write(h)
    os.write(data)
    val pad = (Block - data.length % Block) % Block
    if (pad > 0) os.write(new Array[Byte](pad))
  }

  /** Minimal USTAR walk: (name, bytes) per member, stops at the zero
    * block. Tolerates GNU tar padding and either NUL- or
    * space-terminated octal sizes. */
  private[graft] def parseTar(
      bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = Seq.newBuilder[(String, Array[Byte])]
    var off = 0
    def str(o: Int, len: Int): String = {
      var end = o
      while (end < o + len && bytes(end) != 0) end += 1
      new String(bytes, o, end - o, "UTF-8")
    }
    while (off + Block <= bytes.length && bytes(off) != 0) {
      val name = str(off, 100)
      val size = java.lang.Long.parseLong(str(off + 124, 12).trim, 8)
      val typeflag = bytes(off + 156).toChar
      val dataOff = off + Block
      if (typeflag == '0' || typeflag == 0.toChar)
        out += ((name,
          java.util.Arrays.copyOfRange(bytes, dataOff,
            dataOff + size.toInt)))
      val padded = ((size + Block - 1) / Block * Block).toInt
      off = dataOff + padded
    }
    out.result()
  }
}
