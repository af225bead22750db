package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StringType}

/** WebDataset-style corpus export: the corpus written as N tar shards
  * (`shard-#####.tar`), the layout sequential training loaders consume
  * directly — members stream in a deterministic shuffled order, shards
  * are file-sized units of work, and the whole export is reproducible
  * bit-for-bit from `(seed, ids)`.
  *
  * A document ("sample" in WebDataset terms) is one member per
  * exported column, all sharing the id stem: `cols = Seq("text" ->
  * "txt", "meta" -> "json")` writes `<id>.txt` and `<id>.json`
  * back-to-back — the pairing standard loaders reassemble by stem.
  * String columns write UTF-8 bytes, binary columns write raw bytes;
  * a NULL value writes an empty member (the engine's NULL-text
  * convention, see [[Dedup.dedupSegments]]); a NULL id refuses loudly.
  *
  * Scale shape: shard assignment and in-shard order are
  * [[Sampling.shardAssign]]'s pure-hash permutation (no global sort),
  * one shuffle routes documents to their shard, and each task streams
  * its shard(s) to the target filesystem — no driver involvement, no
  * whole-shard buffering (one member at a time). Each task writes a
  * dot-prefixed attempt-private temp file and renames it into place on
  * success, so a retried or speculative attempt never interleaves with
  * the winner and a crash leaves no partial `shard-*.tar`; the export
  * also clears matching stale shards first, so re-exporting into the
  * same directory with a different `numShards`/seed cannot leave
  * orphans the readers would silently ingest.
  *
  * Shard sizes are ENFORCED at export: projected sizes (exact — tar
  * framing is deterministic) are checked before any byte is written,
  * and a shard that would exceed `maxShardBytes` (default 2 GB)
  * refuses with the shard named. Graft's own readers STREAM each
  * shard member-at-a-time (no whole-shard buffering, no file-size
  * cap), so the default exists for external consumers that read
  * shards whole (e.g. Spark's binaryFile) and for loader-friendly
  * shard sizing — raise it freely when only graft reads the export.
  * Pick `numShards` to make a shard file-sized: thousands of shards
  * at corpus scale, exactly how WebDataset is deployed.
  *
  * Format: plain USTAR — 512-byte headers, octal size, standard
  * checksum, `ustar` magic, two zero blocks at the end — readable by
  * any tar implementation. All timestamps are zero so a re-export is
  * BYTE-identical (determinism over provenance theater).
  */
object Export {

  private val Block = 512

  /** Default export-side shard cap: whole-file readers (Spark's
    * binaryFile and kin) refuse files over Int.MaxValue bytes, and
    * loaders want file-sized shards anyway; graft's own streaming
    * readers have no such limit. */
  val MaxShardBytes: Long = Int.MaxValue.toLong

  /** Single-column convenience: one `<id>.txt` member per document. */
  def writeTarShards(
      df: DataFrame,
      idCol: String,
      textCol: String,
      dir: String,
      numShards: Int,
      seed: String): Int =
    writeTarShards(df, idCol, Seq(textCol -> "txt"), dir, numShards, seed)

  /** Write `df` as `numShards` tar shards under `dir`, one member per
    * entry of `cols` (column name → member extension) per document,
    * in `cols` order. Returns the number of shards written (shards
    * that received no documents write no file). */
  def writeTarShards(
      df: DataFrame,
      idCol: String,
      cols: Seq[(String, String)],
      dir: String,
      numShards: Int,
      seed: String,
      maxShardBytes: Long = MaxShardBytes): Int = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    require(cols.nonEmpty, "writeTarShards needs at least one column")
    require(cols.map(_._2).distinct.length == cols.length,
      s"member extensions must be distinct, got ${cols.map(_._2)}")
    val spark = df.sparkSession
    cols.foreach { case (c, _) =>
      df.schema(c).dataType match {
        case StringType | BinaryType =>
        case other => throw new IllegalArgumentException(
          s"writeTarShards column `$c` must be string or binary " +
            s"(strings write UTF-8, binaries raw bytes), got $other")
      }
    }
    val isBinary = cols.map { case (c, _) =>
      df.schema(c).dataType == BinaryType }
    // NULL id cannot name a member; NULL values write empty members
    val id = col(idCol).cast("string")
    val selected = df.select(
      Seq(when(id.isNull, raise_error(lit(
        s"writeTarShards: NULL `$idCol` cannot name a tar member")))
        .otherwise(id).as("__id")) ++
        cols.map { case (c, _) => col(c).as(s"__m_$c") }: _*)
    val assigned = Sampling.shardAssign(selected, "__id", numShards, seed)

    // Enforce the shard cap BEFORE writing a byte: tar framing is
    // deterministic (512-byte header + data padded to 512 per member,
    // 1024-byte trailer), so projected shard sizes are exact. One
    // extra aggregate pass over the export's own columns — cheap next
    // to writing them, and the alternative is an archive whole-file
    // consumers silently cannot load.
    def padded(c: Column): Column =
      lit(Block.toLong) +
        floor((coalesce(octet_length(c).cast("long"), lit(0L)) +
          lit((Block - 1).toLong)) / lit(Block.toLong)) * lit(Block.toLong)
    val perDoc = cols.map { case (c, _) => padded(col(s"__m_$c")) }
      .reduce(_ + _)
    val oversize = assigned
      .groupBy(col("shard")).agg(sum(perDoc).as("__b"))
      .filter(col("__b") + lit(2L * Block) > maxShardBytes)
      .orderBy(col("__b").desc).limit(5)
      .collect().map(r => (r.getInt(0), r.getLong(1) + 2L * Block))
    if (oversize.nonEmpty)
      throw new IllegalArgumentException(
        s"writeTarShards: shard(s) ${oversize.map { case (s, b) =>
          f"shard-$s%05d.tar ($b bytes)" }.mkString(", ")} would " +
          s"exceed the $maxShardBytes-byte shard cap (whole-file " +
          "consumers refuse such files) — raise numShards until " +
          "every shard fits, or raise maxShardBytes if only graft's " +
          "streaming readers consume this export")

    // Re-exports into a lived-in directory: stale shards from a prior
    // export (different numShards/seed) would otherwise survive and
    // be silently ingested by readTarShards / COPY INTO.
    val (dfs, dirPath) = graft.core.GraftFs.resolve(spark, dir)
    if (graft.core.GraftFs.isDir(dfs, dirPath))
      graft.core.GraftFs.listStatuses(dfs, dirPath)
        .filter { s =>
          val n = s.getPath.getName
          // .shard-* covers attempt temps AND the local filesystem's
          // checksum sidecars for them — all hidden, all ours
          s.isFile && (n.matches("shard-\\d+\\.tar") ||
            n.startsWith(".shard-"))
        }
        .foreach(s => dfs.delete(s.getPath, false))

    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val out = dir
    val binFlags = isBinary.toArray
    val memberExts = cols.map(_._2).toArray
    // hash-repartition on the shard id co-locates each shard's
    // members; a task may receive several whole shards (hash
    // collisions) — the sorted stream rolls to a new tar per shard
    val written = assigned
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shard_pos"))
      .select(Seq(col("shard"), col("__id")) ++
        cols.map { case (c, _) => col(s"__m_$c") }: _*)
      .mapPartitions { it =>
        import org.apache.hadoop.fs.Path
        val attempt = org.apache.spark.TaskContext.get.taskAttemptId()
        val exts = memberExts
        var current = -1
        var fs: org.apache.hadoop.fs.FileSystem = null
        var os: java.io.OutputStream = null
        var tmp: Path = null
        var dst: Path = null
        var count = 0
        def close(): Unit = if (os != null) {
          os.write(new Array[Byte](2 * Block)) // end-of-archive
          os.close()
          os = null
          // task-commit: the attempt-private temp renames into place
          // only on success; content is deterministic, so whichever
          // concurrent attempt lands last wrote identical bytes
          if (fs.exists(dst)) fs.delete(dst, false)
          require(fs.rename(tmp, dst), s"rename $tmp -> $dst failed")
          count += 1
        }
        it.foreach { row =>
          val shard = row.getInt(0)
          if (shard != current) {
            close()
            current = shard
            dst = new Path(out, f"shard-$shard%05d.tar")
            tmp = new Path(out, f".shard-$shard%05d.tar.$attempt.tmp")
            fs = dst.getFileSystem(conf.value)
            os = fs.create(tmp, true)
          }
          val stem = row.getString(1)
          var i = 0
          while (i < exts.length) {
            val data =
              if (row.isNullAt(2 + i)) Array.emptyByteArray
              else if (binFlags(i)) row.getAs[Array[Byte]](2 + i)
              else row.getString(2 + i).getBytes("UTF-8")
            writeMember(os, stem + "." + exts(i), data)
            i += 1
          }
        }
        close()
        Iterator.single(count)
      }(org.apache.spark.sql.Encoders.scalaInt)
      .reduce(_ + _)
    written
  }

  /** Read tar shards back as `(shard, name, text)` — one row per
    * member, bytes decoded as UTF-8. Each shard STREAMS through one
    * sequential Hadoop FS read, member-at-a-time — no whole-shard
    * buffering and no 2 GB file cap on the read side (the write-side
    * `maxShardBytes` default remains, for consumers that read shards
    * whole); plain USTAR plus GNU long-name ('L') and PAX ('x')
    * per-member overrides work, not just [[writeTarShards]]' output. */
  def readTarShards(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    rawMembers(spark, dir)
      .map { case (shard, name, data) =>
        (shard, name, new String(data, "UTF-8"))
      }
      .toDF("shard", "name", "text")
  }

  /** Read tar shards as raw members: `(shard, stem, ext, bytes)` —
    * the multi-member inverse of [[writeTarShards]] before stem
    * reassembly. */
  def readTarMembers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    rawMembers(spark, dir)
      .map { case (shard, name, data) =>
        val dot = name.lastIndexOf('.')
        val (stem, ext) =
          if (dot < 0) (name, "") else (name.take(dot), name.drop(dot + 1))
        (shard, stem, ext, data)
      }
      .toDF("shard", "stem", "ext", "data")
  }

  /** Reassemble multi-member samples by stem: one row per document
    * with a BINARY column per extension in `exts` (named after the
    * extension; cast string columns back with `.cast("string")`).
    * A document missing one of `exts` surfaces NULL there. */
  def readTarSamples(
      spark: SparkSession, dir: String, exts: Seq[String]): DataFrame = {
    require(exts.nonEmpty, "readTarSamples needs at least one extension")
    val members = readTarMembers(spark, dir)
    members.groupBy(col("shard"), col("stem"))
      .agg(
        first(when(col("ext") === exts.head, col("data")),
          ignoreNulls = true).as(exts.head),
        exts.tail.map(e =>
          first(when(col("ext") === e, col("data")),
            ignoreNulls = true).as(e)): _*)
  }

  /** Stream the members of explicit tar files: `(path, name, data)`,
    * one row per member. Each file reads as ONE sequential Hadoop FS
    * stream and parses member-at-a-time, so per-task memory is one
    * MEMBER, not one shard — the shape that holds for arbitrarily
    * large archives (COPY INTO FILEFORMAT = TAR rides this too). */
  def tarMembers(
      spark: SparkSession,
      paths: Seq[String])
      : org.apache.spark.sql.Dataset[(String, String, Array[Byte])] = {
    import spark.implicits._
    require(paths.nonEmpty, "tarMembers needs at least one path")
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val slots = math.min(paths.length,
      math.max(1, spark.sparkContext.defaultParallelism * 2))
    spark.createDataset(paths)
      .repartition(slots) // one tiny row per path — spread the shards
      .mapPartitions { it =>
        it.flatMap { pathStr =>
          val p = new org.apache.hadoop.fs.Path(pathStr)
          val in = p.getFileSystem(conf.value).open(p)
          // task-completion close is the backstop for a limit() that
          // abandons the iterator mid-archive; the eager close below
          // releases the FD as soon as the archive is exhausted, so a
          // task over many tars holds ONE open stream, not one per
          // processed file
          Option(org.apache.spark.TaskContext.get).foreach(
            _.addTaskCompletionListener[Unit](_ => closeQuietly(in)))
          closeOnExhaust(
            parseTarStream(new java.io.BufferedInputStream(in, 1 << 16)),
            in)
            .map { case (name, data) => (pathStr, name, data) }
        }
      }
  }

  private def closeQuietly(c: java.io.Closeable): Unit =
    try c.close() catch { case _: java.io.IOException => }

  /** Wrap `it` so `in` closes the moment the iterator reports
    * exhaustion (idempotent -- the task-completion backstop may close
    * again for iterators abandoned early). */
  private[graft] def closeOnExhaust[A](
      it: Iterator[A], in: java.io.Closeable): Iterator[A] =
    new scala.collection.AbstractIterator[A] {
      private var closed = false
      def hasNext: Boolean = {
        val h = it.hasNext
        if (!h && !closed) { closed = true; closeQuietly(in) }
        h
      }
      def next(): A = it.next()
    }

  private def rawMembers(
      spark: SparkSession,
      dir: String): org.apache.spark.sql.Dataset[(Int, String, Array[Byte])] = {
    import spark.implicits._
    val (fs, dirPath) = graft.core.GraftFs.resolve(spark, dir)
    val tars = graft.core.GraftFs.listStatuses(fs, dirPath)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".tar"))
      .map(_.getPath.toString)
    require(tars.nonEmpty, s"no .tar files under $dir")
    tarMembers(spark, tars.toSeq).map { case (path, name, data) =>
      val shard = "shard-(\\d+)\\.tar".r.findFirstMatchIn(path)
        .map(_.group(1).toInt).getOrElse(-1)
      (shard, name, data)
    }
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

  /** USTAR walk: (name, bytes) per member, stops at the zero block.
    * Tolerates GNU tar padding and either NUL- or space-terminated
    * octal sizes; honors GNU long-name ('L') and per-member PAX ('x')
    * `path`/`size` overrides — external archives with >100-byte names
    * keep their full names instead of a silently truncated key. A PAX
    * GLOBAL header ('g') that redefines path or size refuses loudly
    * (applying it per-member is a different format contract); other
    * global records are irrelevant here and skip. */
  private[graft] def parseTar(
      bytes: Array[Byte]): Seq[(String, Array[Byte])] =
    parseTarStream(new java.io.ByteArrayInputStream(bytes)).toSeq

  // PAX extended records: repeated "<len> <key>=<value>\n" where
  // <len> counts the whole record including itself
  private def paxRecords(data: Array[Byte]): Seq[(String, String)] = {
    val recs = Seq.newBuilder[(String, String)]
    var p = 0
    while (p < data.length) {
      var sp = p
      while (sp < data.length && data(sp) != ' ') sp += 1
      require(sp < data.length,
        s"malformed PAX record at offset $p: no length delimiter")
      val len = new String(data, p, sp - p, "UTF-8").trim.toInt
      // The record must at least cover its own "NNN " prefix and
      // trailing newline (len >= sp - p + 2, so the body substring
      // length is non-negative), never run past the buffer, and never
      // fail to advance p -- a malformed or adversarial record must
      // fail loudly with THIS message, not hang the task or surface
      // as a StringIndexOutOfBoundsException
      require(len >= sp - p + 2 && p + len <= data.length,
        s"malformed PAX record at offset $p: length $len " +
          s"(extended-header data is ${data.length} bytes)")
      val body = new String(data, sp + 1, p + len - sp - 2, "UTF-8")
      val eq = body.indexOf('=')
      if (eq > 0) recs += ((body.take(eq), body.drop(eq + 1)))
      p += len
    }
    recs.result()
  }

  /** Streaming USTAR walk: one member materialized at a time (the
    * memory unit is a MEMBER, never the archive), stopping at the
    * zero block or EOF. File entries frame by their EFFECTIVE size --
    * the PAX `size` override when present (the >8 GB case where the
    * octal header field cannot hold it), the header field otherwise. */
  private[graft] def parseTarStream(
      in: java.io.InputStream): Iterator[(String, Array[Byte])] =
    new scala.collection.AbstractIterator[(String, Array[Byte])] {
      private val header = new Array[Byte](Block)
      private var nameOverride: String = null
      private var sizeOverride: Long = -1L
      private var pending: (String, Array[Byte]) = null
      private var done = false

      private def readFully(buf: Array[Byte], len: Int): Boolean = {
        var off = 0
        while (off < len) {
          val r = in.read(buf, off, len - off)
          if (r < 0) return false
          off += r
        }
        true
      }
      private def skipFully(n: Long): Unit = {
        var left = n
        while (left > 0) {
          val s = in.skip(left)
          if (s > 0) left -= s
          else if (in.read() < 0) return // EOF inside padding: tolerate
          else left -= 1
        }
      }
      private def str(o: Int, len: Int): String = {
        var end = o
        while (end < o + len && header(end) != 0) end += 1
        new String(header, o, end - o, "UTF-8")
      }
      private def entryData(n: Long): Array[Byte] = {
        require(n <= Int.MaxValue, s"tar member over 2 GB ($n bytes) " +
          "cannot materialize as one row -- repack with smaller members")
        val d = new Array[Byte](n.toInt)
        require(readFully(d, n.toInt), "truncated tar entry")
        d
      }

      private def advance(): Unit = {
        while (pending == null && !done) {
          if (!readFully(header, Block) || header(0) == 0) {
            done = true
            return
          }
          val rawName = str(0, 100)
          val size = java.lang.Long.parseLong(str(124, 12).trim, 8)
          val typeflag = header(156).toChar
          typeflag match {
            case '0' | '\u0000' =>
              val n = if (sizeOverride >= 0) sizeOverride else size
              val data = entryData(n)
              skipFully((n + Block - 1) / Block * Block - n)
              val name = if (nameOverride != null) nameOverride else rawName
              nameOverride = null; sizeOverride = -1L
              pending = (name, data)
            case 'L' => // GNU long name: data names the NEXT member
              val d = entryData(size)
              skipFully((size + Block - 1) / Block * Block - size)
              var end = d.length
              while (end > 0 && d(end - 1) == 0) end -= 1
              nameOverride = new String(d, 0, end, "UTF-8")
            case 'x' => // PAX per-member overrides
              val d = entryData(size)
              skipFully((size + Block - 1) / Block * Block - size)
              paxRecords(d).foreach {
                case ("path", v) => nameOverride = v
                case ("size", v) => sizeOverride = v.toLong
                case _ =>
              }
            case 'g' =>
              val d = entryData(size)
              skipFully((size + Block - 1) / Block * Block - size)
              val redefines = paxRecords(d)
                .collect { case (k @ ("path" | "size"), _) => k }
              require(redefines.isEmpty,
                s"tar PAX global header redefines " +
                  s"${redefines.mkString(",")} -- unsupported " +
                  "(per-member 'x' overrides are honored)")
            case _ => // directories, links, other specials: skip data
              skipFully((size + Block - 1) / Block * Block)
          }
        }
      }

      override def hasNext: Boolean = {
        if (pending == null && !done) advance()
        pending != null
      }
      override def next(): (String, Array[Byte]) = {
        if (!hasNext) throw new NoSuchElementException("tar exhausted")
        val m = pending
        pending = null
        m
      }
    }
}
