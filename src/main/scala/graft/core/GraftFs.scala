package graft.core

import java.io.FileNotFoundException
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Hadoop-`FileSystem` facade for the engine's metadata and staging I/O.
  *
  * Every dataset path — scan roots, sidecar files, staged single-file
  * writes — resolves through `org.apache.hadoop.fs.FileSystem`, so a
  * dataset can live on any filesystem Spark itself can reach (local
  * disk, HDFS, S3A, ABFS, GCS), not only `java.nio` local paths. Plain
  * local paths (`/a/b`) keep their exact old behavior via Hadoop's
  * local-FS implementation; URIs (`hdfs://nn/ds`, `s3a://bucket/ds`,
  * `file:/a/b`) route to the implementation registered in the Spark
  * session's Hadoop configuration.
  *
  * The reference engine is explicitly single-node over a local
  * filesystem (padawan `docs/index.rst:45-47`); this layer is what its
  * design needs to hold at the 100 TB / object-store scale.
  */
object GraftFs {

  def conf(spark: SparkSession): Configuration =
    spark.sparkContext.hadoopConfiguration

  /** Resolve a path string to its (FileSystem, Path). The path string is
    * preserved as written (no forced qualification), so local callers
    * see unchanged `/a/b`-style names. */
  def resolve(spark: SparkSession, pathStr: String): (FileSystem, Path) = {
    val p = new Path(pathStr)
    (p.getFileSystem(conf(spark)), p)
  }

  def statusOf(fs: FileSystem, p: Path): Option[FileStatus] =
    try Some(fs.getFileStatus(p))
    catch { case _: FileNotFoundException => None }

  def isDir(fs: FileSystem, p: Path): Boolean =
    statusOf(fs, p).exists(_.isDirectory)

  def isFile(fs: FileSystem, p: Path): Boolean =
    statusOf(fs, p).exists(_.isFile)

  /** Immediate children of `dir` whose name passes `keep`, as full path
    * strings sorted by name — ONE listing RPC for the whole directory. */
  def listFiles(fs: FileSystem, dir: Path)(
      keep: String => Boolean): IndexedSeq[String] =
    fs.listStatus(dir).iterator
      .filter(st => keep(st.getPath.getName))
      .map(_.getPath.toString)
      .toVector
      .sorted

  /** Child FileStatuses of `dir` (one RPC); empty if `dir` is absent. */
  def listStatuses(fs: FileSystem, dir: Path): IndexedSeq[FileStatus] =
    try fs.listStatus(dir).toVector
    catch { case _: FileNotFoundException => Vector.empty }

  /** Every FILE under `dir`, recursively — on object stores one flat
    * paginated LIST (S3A serves `listFiles(recursive)` without
    * per-directory round trips) instead of a probe per subdirectory;
    * empty if `dir` is absent. */
  def listAllFiles(fs: FileSystem, dir: Path): IndexedSeq[FileStatus] =
    try {
      val out = Vector.newBuilder[FileStatus]
      val it = fs.listFiles(dir, true)
      while (it.hasNext) out += it.next()
      out.result()
    } catch { case _: FileNotFoundException => Vector.empty }

  def readString(fs: FileSystem, p: Path): String = retryChecksum {
    val in = fs.open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Retry a small read briefly on transient checksum errors: an
    * atomic replace renames the data file and its `.crc` separately
    * on checksummed local filesystems, so a concurrent reader landing
    * between the two renames sees a mismatch that clears on the next
    * attempt. Persistent corruption still surfaces after the bound. */
  def retryChecksum[A](f: => A): A = {
    var attempts = 0
    while (true) {
      try return f
      catch {
        case e: org.apache.hadoop.fs.ChecksumException =>
          attempts += 1
          if (attempts >= 20) throw e
          Thread.sleep(25)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Retry a sidecar read briefly when the file is mid-REPLACE: a
    * filesystem whose overwrite-rename degrades to delete-then-rename
    * exposes a moment with no file at the target; the replacement
    * lands immediately after, so a short bounded retry distinguishes
    * that window from a genuinely missing sidecar (which still throws
    * after the bound). */
  def retryReplaced[A](f: => A): A = {
    var attempts = 0
    while (true) {
      try return retryChecksum(f)
      catch {
        case e: java.io.FileNotFoundException =>
          attempts += 1
          if (attempts >= 20) throw e
          Thread.sleep(25)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Write a small text file ATOMICALLY: stage under a hidden
    * same-directory temp name, then rename into place. Readers never
    * observe a partially-written file — load-bearing for the ledger
    * files concurrent readers poll (`_graft_history/vN.json`, which
    * the change-feed stream reads WHILE a maintenance commit writes
    * it; a partial read there would defeat the stream's mid-commit
    * detection). */
  def writeString(fs: FileSystem, p: Path, s: String): Unit = {
    val parent = Option(p.getParent).getOrElse(new Path("."))
    val tmp = new Path(parent,
      s".${p.getName}.tmp-${java.util.UUID.randomUUID().toString}")
    writeStringDirect(fs, tmp, s)
    try moveOverwrite(fs, tmp, p)
    finally { if (fs.exists(tmp)) fs.delete(tmp, false); () }
  }

  /** Direct, NON-atomic write — for callers that stage and rename
    * themselves (e.g. [[Sidecar.write]]'s own temp protocol); plain
    * callers use the atomic [[writeString]]. */
  def writeStringDirect(fs: FileSystem, p: Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  def deleteRecursive(fs: FileSystem, p: Path): Unit =
    if (fs.exists(p)) { fs.delete(p, true); () }

  /** The last path segment of a sidecar file entry. Locally written
    * entries ARE bare names (this is the identity for them); a
    * shallow-clone entry is an absolute path into the source table,
    * and its base name is the identity the deletion-vector overlay
    * keys by (`_metadata.file_path`'s base name — stable across the
    * clone because clones share the source's physical files). */
  def baseName(entry: String): String = {
    val i = entry.lastIndexOf('/')
    if (i < 0) entry else entry.substring(i + 1)
  }

  /** Recursive copy `src` → `dst` (both may be on different
    * FileSystems); `dst` is created, never overwritten. Used for the
    * KB-scale deletion-vector overlay a shallow clone inherits —
    * never for data files. */
  def copyRecursive(
      srcFs: FileSystem, src: Path,
      dstFs: FileSystem, dst: Path,
      cnf: Configuration): Unit = {
    org.apache.hadoop.fs.FileUtil.copy(
      srcFs, src, dstFs, dst, false, false, cnf)
    ()
  }

  def mkdirs(fs: FileSystem, p: Path): Unit = { fs.mkdirs(p); () }

  /** Move `src` onto `target`, replacing it (both are same-FS paths).
    *
    * Prefers `FileContext.rename(..., Options.Rename.OVERWRITE)`, which
    * on POSIX-backed filesystems is one atomic rename(2) — no window in
    * which the target is deleted but its replacement not yet in place.
    * Filesystems without an `AbstractFileSystem` binding (no
    * FileContext) fall back to delete-then-rename; callers who must
    * never lose the target (sidecar metadata) write the replacement to
    * a same-directory temp name first, so even the fallback's window
    * only ever exposes a fully-written replacement. */
  def moveOverwrite(fs: FileSystem, src: Path, target: Path): Unit = {
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        fs.getUri, fs.getConf)
      fc.rename(src, target, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      return
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException => ()
    }
    if (fs.exists(target)) fs.delete(target, false)
    if (!fs.rename(src, target))
      throw new java.io.IOException(s"rename $src -> $target failed")
  }

  /** A fresh uniquely-named staging dir under `parent` (same FS as the
    * final destination so the finishing `rename` is atomic-ish and never
    * a cross-FS copy). Caller deletes it recursively when done.
    *
    * `owner` (the DATASET dir's name) scopes stages created in the
    * dataset's PARENT: the name becomes `<prefix><owner>.<uuid>`, so
    * one table's vacuum debris sweep can tell its own crashed stages
    * from a sibling table's IN-FLIGHT ones sharing that parent —
    * without the tag, table A's vacuum could delete table B's live
    * stage mid-op. */
  def mkStageDir(
      fs: FileSystem, parent: Path, prefix: String,
      owner: String = ""): Path = {
    val tag = if (owner.isEmpty) "" else owner + "."
    val p = new Path(parent,
      prefix + tag + java.util.UUID.randomUUID().toString)
    fs.mkdirs(p)
    p
  }

  /** Byte length per file path, batched: ONE `listStatus` per distinct
    * parent directory instead of one RPC per file (at 10^5 files on an
    * object store, per-file `getFileStatus` is the driver bottleneck).
    * Falls back to a direct status probe for files a listing missed. */
  def fileSizes(
      cnf: Configuration, files: Seq[String]): IndexedSeq[(Path, Long)] = {
    val paths = files.map(new Path(_)).toVector
    val byLen = scala.collection.mutable.HashMap.empty[Path, Long]
    paths.groupBy(_.getParent).foreach { case (parent, _) =>
      if (parent != null) {
        val fs = parent.getFileSystem(cnf)
        try fs.listStatus(parent).foreach(st => byLen(st.getPath) = st.getLen)
        catch { case _: FileNotFoundException => }
      }
    }
    paths.map { p =>
      val fs = p.getFileSystem(cnf)
      val qp = fs.makeQualified(p)
      (qp, byLen.getOrElse(qp, fs.getFileStatus(p).getLen))
    }
  }
}
