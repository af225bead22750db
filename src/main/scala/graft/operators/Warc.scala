package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC/WET ingestion and export (ISO 28500 — the CommonCrawl landing
  * format, so a pretraining pipeline can start at the crawl instead
  * of a pre-converted parquet table).
  *
  * Read side: each archive streams through ONE sequential Hadoop FS
  * read and parses record-at-a-time (the [[Export.tarMembers]]
  * discipline — per-task memory is one RECORD, never the file, no
  * 2 GB cap), with transparent gzip via the JVM's built-in
  * GZIPInputStream (multi-member concatenated gzip — the CommonCrawl
  * `.warc.wet.gz` layout — inflates as one logical stream; no
  * external codec). Malformed records refuse loudly: a bad version
  * line, a missing/invalid Content-Length or a truncated body names
  * the file and offset instead of silently skipping.
  *
  * Write side ([[writeWetShards]]): the corpus as WET conversion
  * records in `numShards` deterministic shards — one shuffle via
  * [[Sampling.shardAssign]], streamed record-at-a-time per shard
  * task, attempt-private temp + rename commits. All dates are epoch
  * and record ids derive from md5 of the URI, so a re-export is
  * BYTE-identical (the tar writer's determinism-over-provenance
  * rule).
  *
  * `COPY INTO t FROM '/landing' FILEFORMAT = WARC` rides
  * [[warcRecords]] with the same exactly-once source ledger as every
  * other format: `WARC-Target-URI` → the table's index column,
  * record body → the text column; records without a target URI
  * (warcinfo) skip, and `FORMAT_OPTIONS('types'='conversion')`
  * restricts the WARC-Type set.
  */
object Warc {

  /** One parsed record: header map (names lowercased, values
    * trimmed) and the exact content block. */
  private[graft] final case class WarcRecord(
      headers: Map[String, String], body: Array[Byte]) {
    def warcType: String = headers.getOrElse("warc-type", "")
    def targetUri: String = headers.getOrElse("warc-target-uri", "")
  }

  /** Stream the records of explicit WARC/WET files (plain or gzip):
    * `(path, warc_type, target_uri, body)`, one row per record. One
    * sequential FS stream per file, eagerly closed on exhaustion with
    * a task-completion backstop. */
  def warcRecords(
      spark: SparkSession,
      paths: Seq[String])
      : org.apache.spark.sql.Dataset[(String, String, String, Array[Byte])] = {
    import spark.implicits._
    require(paths.nonEmpty, "warcRecords needs at least one path")
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val slots = math.min(paths.length,
      math.max(1, spark.sparkContext.defaultParallelism * 2))
    spark.createDataset(paths)
      .repartition(slots)
      .mapPartitions { it =>
        it.flatMap { pathStr =>
          val p = new org.apache.hadoop.fs.Path(pathStr)
          val raw = p.getFileSystem(conf.value).open(p)
          // backstop for a failure between open and wrapping
          Option(org.apache.spark.TaskContext.get).foreach(
            _.addTaskCompletionListener[Unit](_ =>
              try raw.close() catch { case _: java.io.IOException => }))
          val in = maybeGunzip(
            new java.io.BufferedInputStream(raw, 1 << 16), pathStr)
          // close the OUTERMOST stream (ends the gzip Inflater's
          // native buffer, then the FS stream underneath) — closing
          // only `raw` leaked one Inflater per gzip'd archive until
          // GC finalization
          Option(org.apache.spark.TaskContext.get).foreach(
            _.addTaskCompletionListener[Unit](_ =>
              try in.close() catch { case _: java.io.IOException => }))
          Export.closeOnExhaust(parseWarcStream(in, pathStr), in)
            .map(r => (pathStr, r.warcType, r.targetUri, r.body))
        }
      }
  }

  /** Wrap gzip'd input transparently (magic-sniffed, not by
    * extension). Concatenated members — the CommonCrawl one-member-
    * per-record `.warc.wet.gz` layout — inflate through an explicit
    * member loop ([[MultiMemberGzipInputStream]]), NOT
    * java.util.zip.GZIPInputStream: GZIPInputStream only attempts the
    * next member when `available() > 0` on the underlying stream, and
    * FS streams that report 0 (object stores commonly do) silently
    * drop every member after the first — silent record loss, the
    * opposite of this reader's refuse-loudly contract. */
  private def maybeGunzip(
      in: java.io.InputStream, src: String): java.io.InputStream = {
    val pb = new java.io.PushbackInputStream(in, 2)
    val b0 = pb.read()
    val b1 = pb.read()
    if (b1 >= 0) pb.unread(b1)
    if (b0 >= 0) pb.unread(b0)
    if (b0 == 0x1f && b1 == 0x8b)
      new MultiMemberGzipInputStream(pb, src)
    else pb
  }

  /** RFC 1952 multi-member gzip reader. Each member parses through an
    * explicit loop — header, raw-deflate body, CRC32 + ISIZE trailer,
    * then re-sniff for the next member — so member advancement never
    * depends on the underlying stream's `available()` heuristic, and
    * every trailer is actually VERIFIED (GZIPInputStream's silent
    * stop also skipped trailer checks on dropped members). Any
    * malformation — a non-gzip byte between members, a truncated
    * body, a CRC or length mismatch — refuses loudly naming the
    * source. `close()` ends the Inflater (native buffer) and closes
    * the underlying stream. */
  private[graft] final class MultiMemberGzipInputStream(
      in: java.io.InputStream, src: String) extends java.io.InputStream {
    private val inf = new java.util.zip.Inflater(true)
    private val crc = new java.util.zip.CRC32
    private val buf = new Array[Byte](1 << 16)
    private var bufLen = 0
    private var bufPos = 0
    private var eof = false
    private var memberOpen = false
    private val one = new Array[Byte](1)

    /** Bytes available in `buf`, refilling if drained; -1 at raw EOF. */
    private def fill(): Int = {
      if (bufPos >= bufLen) {
        bufLen = in.read(buf)
        bufPos = 0
        if (bufLen <= 0) { bufLen = 0; return -1 }
      }
      bufLen - bufPos
    }

    private def readByte(): Int =
      if (fill() < 0) -1
      else { val b = buf(bufPos) & 0xff; bufPos += 1; b }

    private def needByte(what: String): Int = {
      val b = readByte()
      require(b >= 0, s"$src: truncated gzip member ($what)")
      b
    }

    private def skipBytes(n: Int, what: String): Unit =
      (0 until n).foreach(_ => needByte(what))

    private def readLe32(what: String): Long = {
      val b0 = needByte(what); val b1 = needByte(what)
      val b2 = needByte(what); val b3 = needByte(what)
      (b0.toLong | (b1.toLong << 8) | (b2.toLong << 16) | (b3.toLong << 24))
    }

    /** Parse the next member header; false at clean EOF (no members
      * left). A non-gzip byte where a member should start refuses. */
    private def readHeader(): Boolean = {
      val b0 = readByte()
      if (b0 < 0) return false
      val b1 = readByte()
      require(b0 == 0x1f && b1 == 0x8b,
        f"$src: expected a gzip member header, got bytes 0x$b0%02x 0x${b1 & 0xff}%02x " +
          "(trailing garbage after a gzip member)")
      val cm = needByte("compression method")
      require(cm == 8, s"$src: unsupported gzip compression method $cm")
      val flg = needByte("flags")
      skipBytes(6, "mtime/xfl/os") // MTIME(4) XFL OS
      if ((flg & 0x04) != 0) { // FEXTRA
        val xlen = needByte("xlen") | (needByte("xlen") << 8)
        skipBytes(xlen, "extra field")
      }
      if ((flg & 0x08) != 0) // FNAME: zero-terminated
        while (needByte("file name") != 0) ()
      if ((flg & 0x10) != 0) // FCOMMENT
        while (needByte("comment") != 0) ()
      if ((flg & 0x02) != 0) skipBytes(2, "header crc") // FHCRC
      inf.reset()
      crc.reset()
      memberOpen = true
      true
    }

    private def readTrailer(): Unit = {
      // bytes the inflater took but did not consume belong to the
      // trailer / next member — return them to our buffer
      bufPos = bufLen - inf.getRemaining
      val storedCrc = readLe32("trailer crc32")
      val storedLen = readLe32("trailer isize")
      require(storedCrc == crc.getValue,
        s"$src: gzip CRC mismatch (stored $storedCrc, computed ${crc.getValue})")
      require(storedLen == (inf.getBytesWritten & 0xffffffffL),
        s"$src: gzip ISIZE mismatch (stored $storedLen, " +
          s"inflated ${inf.getBytesWritten & 0xffffffffL})")
      memberOpen = false
    }

    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (len == 0) return 0
      while (true) {
        if (eof) return -1
        if (!memberOpen && !readHeader()) { eof = true; return -1 }
        if (inf.finished()) readTrailer()
        else {
          if (inf.needsInput()) {
            require(fill() > 0,
              s"$src: truncated gzip member (EOF mid-deflate stream)")
            inf.setInput(buf, bufPos, bufLen - bufPos)
            bufPos = bufLen
          }
          val n =
            try inf.inflate(b, off, len)
            catch { case e: java.util.zip.DataFormatException =>
              throw new java.io.IOException(
                s"$src: corrupt deflate data: ${e.getMessage}", e)
            }
          if (n > 0) { crc.update(b, off, n); return n }
          // n == 0 with !finished && !needsInput cannot happen for
          // gzip (no preset dictionary); loop refills or finishes
        }
      }
      -1 // unreachable
    }

    override def read(): Int =
      if (read(one, 0, 1) < 0) -1 else one(0) & 0xff

    override def close(): Unit = {
      inf.end()
      in.close()
    }
  }

  /** Streaming WARC walk: one record materialized at a time. Frames
    * strictly: `WARC/1.x` version line, CRLF header lines (obsolete
    * folding honored) to the first blank line, exactly Content-Length
    * body bytes, then the two record-terminating CRLFs. */
  private[graft] def parseWarcStream(
      in: java.io.InputStream,
      src: String = "<stream>"): Iterator[WarcRecord] =
    new scala.collection.AbstractIterator[WarcRecord] {
      private var pending: WarcRecord = null
      private var done = false

      // CRLF- (or bare-LF-) terminated line as ISO-8859-1-safe bytes
      // decoded UTF-8; null at EOF
      private def readLine(): String = {
        val buf = new java.io.ByteArrayOutputStream(128)
        var c = in.read()
        if (c < 0) return null
        while (c >= 0 && c != '\n') { buf.write(c); c = in.read() }
        val b = buf.toByteArray
        val n = if (b.nonEmpty && b(b.length - 1) == '\r') b.length - 1
          else b.length
        new String(b, 0, n, java.nio.charset.StandardCharsets.UTF_8)
      }

      private def readFully(buf: Array[Byte]): Unit = {
        var off = 0
        while (off < buf.length) {
          val r = in.read(buf, off, buf.length - off)
          require(r >= 0, s"$src: truncated WARC content block " +
            s"(${buf.length - off} of ${buf.length} bytes missing)")
          off += r
        }
      }

      private def advance(): Unit = {
        if (pending != null || done) return
        // tolerate blank padding between records, stop at EOF
        var line = readLine()
        while (line != null && line.isEmpty) line = readLine()
        if (line == null) { done = true; return }
        require(line.startsWith("WARC/"),
          s"$src: expected a WARC/1.x version line, got '${line.take(40)}'")
        val hdrs = scala.collection.mutable.ArrayBuffer[(String, String)]()
        var h = readLine()
        while (h != null && h.nonEmpty) {
          if ((h.startsWith(" ") || h.startsWith("\t")) && hdrs.nonEmpty) {
            // obsolete folding: continuation appends to the previous
            val (k, v) = hdrs.last
            hdrs(hdrs.length - 1) = (k, v + " " + h.trim)
          } else {
            val i = h.indexOf(':')
            require(i > 0, s"$src: malformed WARC header line '$h'")
            hdrs += ((h.take(i).trim.toLowerCase(java.util.Locale.ROOT),
              h.drop(i + 1).trim))
          }
          h = readLine()
        }
        require(h != null, s"$src: EOF inside a WARC header block")
        val m = hdrs.toMap
        val len = m.get("content-length") match {
          case Some(v) if v.forall(_.isDigit) && v.nonEmpty => v.toLong
          case other => throw new IllegalArgumentException(
            s"$src: missing or non-numeric Content-Length ($other)")
        }
        require(len <= Int.MaxValue, s"$src: WARC record over 2 GB " +
          s"($len bytes) cannot materialize as one row")
        val body = new Array[Byte](len.toInt)
        readFully(body)
        pending = WarcRecord(m, body)
      }

      def hasNext: Boolean = { advance(); pending != null }
      def next(): WarcRecord = {
        advance()
        if (pending == null) throw new NoSuchElementException
        val r = pending
        pending = null
        r
      }
    }

  // ---- WET export ----

  private val Iso = "1970-01-01T00:00:00Z"

  /** Deterministic urn:uuid from the md5 of `s` — record identity as
    * a pure function of content, so re-exports are byte-identical. */
  private def uuidOf(s: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    s"<urn:uuid:${h.substring(0, 8)}-${h.substring(8, 12)}-" +
      s"${h.substring(12, 16)}-${h.substring(16, 20)}-${h.substring(20)}>"
  }

  private def crlf(sb: StringBuilder, s: String): Unit = {
    sb.append(s); sb.append("\r\n"); ()
  }

  private[graft] def wetRecord(
      uri: String, body: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder(256)
    crlf(sb, "WARC/1.0")
    crlf(sb, "WARC-Type: conversion")
    crlf(sb, s"WARC-Target-URI: $uri")
    crlf(sb, s"WARC-Date: $Iso")
    crlf(sb, s"WARC-Record-ID: ${uuidOf(uri)}")
    crlf(sb, "Content-Type: text/plain")
    crlf(sb, s"Content-Length: ${body.length}")
    crlf(sb, "")
    val head = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[Byte](head.length + body.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(body, 0, out, head.length, body.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  private def warcinfoRecord(shard: Int): Array[Byte] = {
    val fields = "software: graft\r\nformat: WARC File Format 1.0\r\n"
    val body = fields.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new StringBuilder(192)
    crlf(sb, "WARC/1.0")
    crlf(sb, "WARC-Type: warcinfo")
    crlf(sb, s"WARC-Date: $Iso")
    crlf(sb, s"WARC-Record-ID: ${uuidOf(s"warcinfo:$shard")}")
    crlf(sb, "Content-Type: application/warc-fields")
    crlf(sb, s"Content-Length: ${body.length}")
    crlf(sb, "")
    val head = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    head ++ body ++ "\r\n\r\n".getBytes(
      java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Write `df` as `numShards` WET shards (`shard-NNNNN.warc.wet`,
    * or `.warc.wet.gz` with `compress = true` — the JVM's gzip with
    * epoch header time, so compressed re-exports stay byte-identical
    * and [[warcRecords]]' magic-sniffing reader ingests either)
    * under `dir`: one warcinfo record then one conversion record per
    * document, in the deterministic [[Sampling.shardAssign]] order.
    * Returns the number of shards written. NULL URIs refuse (a record
    * needs its identity); NULL text writes an empty body. Stale
    * shards from a prior export into the same dir are removed first
    * (the [[Export.writeTarShards]] re-export discipline). */
  def writeWetShards(
      df: DataFrame,
      uriCol: String,
      textCol: String,
      dir: String,
      numShards: Int,
      seed: String,
      compress: Boolean = false): Int = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val spark = df.sparkSession
    val uri = col(uriCol).cast("string")
    val selected = df.select(
      when(uri.isNull, raise_error(lit(
        s"writeWetShards: NULL `$uriCol` cannot identify a WARC record")))
        .otherwise(uri).as("__id"),
      coalesce(col(textCol).cast("string"), lit("")).as("__text"))
    val assigned = Sampling.shardAssign(selected, "__id", numShards, seed)

    val (dfs, dirPath) = graft.core.GraftFs.resolve(spark, dir)
    if (graft.core.GraftFs.isDir(dfs, dirPath))
      graft.core.GraftFs.listStatuses(dfs, dirPath)
        .filter { s =>
          val n = s.getPath.getName
          s.isFile && (n.matches("shard-\\d+\\.warc\\.wet(\\.gz)?") ||
            n.startsWith(".shard-"))
        }
        .foreach(s => dfs.delete(s.getPath, false))

    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val out = dir
    assigned
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shard_pos"))
      .select(col("shard"), col("__id"), col("__text"))
      .mapPartitions { it =>
        import org.apache.hadoop.fs.Path
        val attempt = org.apache.spark.TaskContext.get.taskAttemptId()
        var current = -1
        var fs: org.apache.hadoop.fs.FileSystem = null
        var os: java.io.OutputStream = null
        var tmp: Path = null
        var dst: Path = null
        var count = 0
        def close(): Unit = if (os != null) {
          os.close()
          os = null
          if (fs.exists(dst)) fs.delete(dst, false)
          require(fs.rename(tmp, dst), s"rename $tmp -> $dst failed")
          count += 1
        }
        it.foreach { row =>
          val shard = row.getInt(0)
          if (shard != current) {
            close()
            current = shard
            val ext = if (compress) ".warc.wet.gz" else ".warc.wet"
            dst = new Path(out, f"shard-$shard%05d$ext")
            tmp = new Path(out, f".shard-$shard%05d$ext.$attempt.tmp")
            fs = dst.getFileSystem(conf.value)
            val base = new java.io.BufferedOutputStream(
              fs.create(tmp, true), 1 << 16)
            os = if (compress)
              new java.util.zip.GZIPOutputStream(base, 1 << 16)
            else base
            os.write(warcinfoRecord(shard))
          }
          os.write(wetRecord(row.getString(1), row.getString(2)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        }
        close()
        Iterator.single(count)
      }(org.apache.spark.sql.Encoders.scalaInt)
      .reduce(_ + _)
  }

  /** Read WET shards back as `(shard, uri, text)` — the roundtrip
    * inverse of [[writeWetShards]] (warcinfo records skip; any
    * `.warc` / `.wet` / gzip'd file under `dir` streams). */
  def readWetShards(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (fs, dirPath) = graft.core.GraftFs.resolve(spark, dir)
    val files = graft.core.GraftFs.listStatuses(fs, dirPath)
      .filter(s => s.isFile && {
        val n = s.getPath.getName
        n.endsWith(".warc") || n.endsWith(".wet") ||
          n.endsWith(".warc.gz") || n.endsWith(".wet.gz")
      })
      .map(_.getPath.toString)
    require(files.nonEmpty, s"no .warc/.wet files under $dir")
    warcRecords(spark, files.toSeq)
      .filter(_._4 != null)
      .map { case (path, _, uri, body) =>
        val shard = "shard-(\\d+)\\.".r.findFirstMatchIn(path)
          .map(_.group(1).toInt).getOrElse(-1)
        (shard, uri, new String(body,
          java.nio.charset.StandardCharsets.UTF_8))
      }
      .filter(_._2.nonEmpty)
      .toDF("shard", "uri", "text")
  }
}
