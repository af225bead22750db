package graft

import java.net.URI

import org.apache.hadoop.fs.{FSDataOutputStream, Path => HPath}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{PDataset, Sidecar, Stats, GraftFs}
import Fixtures._

/** Local filesystem that fails any write of a staged sidecar metadata
  * temp file — simulates a crash mid-rewrite. Registered under the
  * `faulty:` scheme via `fs.faulty.impl`. */
class FaultyFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: URI = URI.create("faulty:///")

  private def check(f: HPath): Unit =
    if (f.getName.startsWith("." + Sidecar.MetadataFile + ".tmp-"))
      throw new java.io.IOException("injected metadata write failure")

  override def create(
      f: HPath, overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: Progressable): FSDataOutputStream = {
    check(f)
    super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  }

  override def create(
      f: HPath, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    check(f)
    super.create(
      f, permission, overwrite, bufferSize, replication, blockSize, progress)
  }
}

/** The round-3 Hadoop FileSystem port, actually exercised through URI
  * spellings: every dataset operation must behave identically whether
  * the path is `/a/b` or `file:/a/b`, stats keys must be
  * scheme-qualified and collision-free across authorities, and a
  * failed sidecar rewrite must never destroy the previous metadata.
  */
class FsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("normalizePath canonicalizes file URIs, plain paths, and object-store URIs") {
    assert(Stats.normalizePath("/a/b.parquet") == "file:/a/b.parquet")
    assert(Stats.normalizePath("file:/a/b.parquet") == "file:/a/b.parquet")
    assert(Stats.normalizePath("file:///a/b.parquet") == "file:/a/b.parquet")
    // input_file_name() percent-encodes; driver-side paths don't.
    assert(Stats.normalizePath("file:///a/b%20c.parquet") == "file:/a/b c.parquet")
    assert(Stats.normalizePath("file:/a/./x/../b.parquet") == "file:/a/b.parquet")
    // Scheme and authority are kept: same key path in two buckets must
    // not collide onto one stats entry.
    assert(Stats.normalizePath("s3a://bucket/x/../y/part0.parquet")
      == "s3a://bucket/y/part0.parquet")
    assert(Stats.normalizePath("s3a://a/x/part0.parquet")
      != Stats.normalizePath("s3a://b/x/part0.parquet"))
    // Scheme-less relative paths key to the absolute local form.
    val rel = Stats.normalizePath("rel/x.parquet")
    assert(rel.startsWith("file:/") && rel.endsWith("/rel/x.parquet"))
  }

  test("scan, reindex, slice through a file: URI") {
    val dir = tempDir("fs-scan")
    writeDatetimeSample(spark, dir)
    val ds = PDataset.scanParquet(spark, "file:" + dir)
      .reindex(datetimeIndexColumns)
    checkBoundsAndSizes(ds)
    assert(ds.toDF.count() == 98)
    val sl = ds.slice(lb = datetimeLowerBounds(1))
    assert(sl.toDF.count() == 72)
  }

  test("fast write round-trips through a file: URI") {
    val src = tempDir("fs-fastwrite-src")
    writeDatetimeSample(spark, src)
    val ds = PDataset.scanParquet(spark, src).reindex(datetimeIndexColumns)
    val target = "file:" + tempDir("fs-fastwrite") + "/out"
    val out = ds.repartition(30).writeParquet(target)
    checkBoundsAndSizes(out)
    assertSameRows(out.toDF, ds.toDF)
    // Re-scan through the same URI spelling.
    val back = PDataset.scanParquet(spark, target)
    assert(back.knownBounds && back.knownSizes)
    assertSameRows(back.toDF, ds.toDF)
  }

  test("row-mode scatter write round-trips through a file: URI") {
    val src = tempDir("fs-rowscatter-src")
    writeDatetimeSample(spark, src)
    val ds = PDataset.scanParquet(spark, src).reindex(Seq.empty)
    val target = "file:" + tempDir("fs-rowscatter") + "/out"
    val out = ds.repartition(17).writeParquet(target)
    assert(out.npartitions == 6)
    assert(out.sizes.get.sum == 98)
    assertSameRows(out.toDF, ds.toDF)
    val back = PDataset.scanParquet(spark, target)
    assert(back.knownSizes)
    assertSameRows(back.toDF, ds.toDF)
  }

  test("generic write, append, and writeMetadata through file: URIs") {
    val src = tempDir("fs-generic-src")
    writeDatetimeSample(spark, src)
    val ds = PDataset.scanParquet(spark, src).reindex(datetimeIndexColumns)
    val target = "file:" + tempDir("fs-generic") + "/out"
    val w1 = ds.writeParquet(target)
    assert(w1.toDF.count() == 98)
    val w2 = ds.writeParquet(target, append = true)
    assert(w2.toDF.count() == 196)
    checkBoundsAndSizes(w2)

    // writeMetadata over a bare directory of part files, URI-spelled.
    val bare = tempDir("fs-writemeta")
    writeDatetimeSample(spark, bare)
    PDataset.writeMetadata(spark, "file:" + bare, Seq("date"))
    val scanned = PDataset.scanParquet(spark, "file:" + bare)
    assert(scanned.knownBounds && scanned.knownSizes)
    assert(scanned.toDF.count() == 98)
  }

  test("moveOverwrite replaces an existing file and removes the source") {
    val dir = tempDir("fs-move")
    val (fs, _) = GraftFs.resolve(spark, dir)
    val a = new HPath(dir, "a.txt")
    val b = new HPath(dir, "b.txt")
    GraftFs.writeString(fs, a, "new")
    GraftFs.writeString(fs, b, "old")
    GraftFs.moveOverwrite(fs, a, b)
    assert(GraftFs.readString(fs, b) == "new")
    assert(!fs.exists(a))
  }

  test("failed metadata rewrite leaves the previous sidecar intact") {
    val src = tempDir("fs-faulty-src")
    writeDatetimeSample(spark, src)
    val target = tempDir("fs-faulty") + "/ds"
    val ds = PDataset.scanParquet(spark, src).reindex(datetimeIndexColumns)
    ds.writeParquet(target)
    val before = Sidecar.load(spark, target)

    spark.sparkContext.hadoopConfiguration
      .set("fs.faulty.impl", classOf[FaultyFs].getName)
    val ex = intercept[java.io.IOException] {
      Sidecar.write(spark, "faulty:" + target, Seq("date"),
        Seq("bogus.parquet"), Seq(1L),
        Seq(Vector(Some(dt("2099-01-01")))), Seq(Vector(Some(dt("2099-01-01")))),
        0L, before.schema)
    }
    assert(ex.getMessage.contains("injected"))

    // The old sidecar survives the failed rewrite, byte-for-byte usable.
    val after = Sidecar.load(spark, target)
    assert(after.files == before.files)
    assert(after.sizes == before.sizes)
    assert(after.maxPartitionIndex == before.maxPartitionIndex)
    // No temp litter left behind.
    val (fs, p) = GraftFs.resolve(spark, target)
    assert(GraftFs.listStatuses(fs, p)
      .forall(!_.getPath.getName.contains(".tmp-")))
  }
}
