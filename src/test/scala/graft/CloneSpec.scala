package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{PDataset, Sidecar}
import graft.operators.{DeletionVectors, Maintenance}
import Fixtures._

/** Shallow clone: a zero-copy metadata-only table branch. The clone's
  * sidecar references the source's data files by absolute path; reads
  * are identical, mutations diverge copy-on-write, and NOTHING the
  * clone does — update, delete, truncate, compact, vacuum,
  * materialize — may ever delete a byte of the source table.
  */
class CloneSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def keyedDF(lo: Long, n: Long): DataFrame =
    spark.range(lo, lo + n).select(
      col("id").as("k"),
      (col("id") % 7).cast("int").as("grp"),
      concat(lit("v"), col("id")).as("payload"))

  private def writeKeyed(dir: String, n: Int, rowsPerFile: Int): PDataset = {
    val parts = (0 until n by rowsPerFile).map { lo =>
      PDataset.fromDataFrame(
        keyedDF(lo.toLong, math.min(rowsPerFile, n - lo).toLong), Seq("k"))
    }
    PDataset.concat(parts).writeParquet(dir)
  }

  /** name -> mtime of every data file the source references. */
  private def srcState(dir: String): Map[String, Long] = {
    val m = Sidecar.load(spark, dir)
    m.files.map { f =>
      f -> Files.getLastModifiedTime(Paths.get(dir, f)).toMillis
    }.toMap
  }

  private def dataFilesIn(dir: String): Seq[String] =
    Option(new java.io.File(dir).list()).map(_.toSeq).getOrElse(Nil)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_"))

  test("clone reads the source exactly, holds zero data files, and " +
      "prunes slices like the source") {
    val base = tempDir("clone-read")
    val src = base + "/src"
    val dst = base + "/dst"
    writeKeyed(src, 300, 30)
    val n = Maintenance.shallowClone(spark, src, dst)
    assert(n == 10)
    // zero-copy: the clone directory holds sidecars only
    assert(dataFilesIn(dst).isEmpty)
    val cloned = PDataset.scanParquet(spark, dst)
    assert(cloned.npartitions == 10)
    checkBoundsAndSizes(cloned)
    assertSameRows(cloned.toDF, keyedDF(0, 300))
    // sidecar pruning works through absolute entries: a 1-file band
    val sliced = cloned.slice(Seq(Some(30L)), Seq(Some(60L)))
    assert(sliced.npartitions == 1)
    assertSameRows(sliced.toDF, keyedDF(30, 30))
  }

  test("mutations on the clone are copy-on-write: the source's files " +
      "stay byte-identical and present") {
    val base = tempDir("clone-cow")
    val src = base + "/src"
    val dst = base + "/dst"
    writeKeyed(src, 300, 30)
    val before = srcState(src)
    Maintenance.shallowClone(spark, src, dst)

    // update one band, delete another, truncate-free mutations only
    val ur = Maintenance.updateWhere(spark, dst, col("k") < 30L,
      Seq("payload" -> lit("edited")))
    assert(ur.rewritten == 1, ur.toString)
    Maintenance.deleteRange(spark, dst, Seq(Some(60L)), Seq(Some(90L)))

    assert(srcState(src) == before) // every source byte untouched
    assertSameRows(PDataset.scanParquet(spark, src).toDF, keyedDF(0, 300))
    val got = PDataset.scanParquet(spark, dst).toDF
    assert(got.count() == 270)
    assert(got.where(col("payload") === "edited").count() == 30)
    // rewritten band landed as clone-LOCAL files
    assert(dataFilesIn(dst).nonEmpty)
    // untouched bands still read from the source (absolute entries)
    val m = Sidecar.load(spark, dst)
    assert(m.files.count(_.contains("/")) == 8)
  }

  test("truncate and vacuum on the clone never delete source bytes") {
    val base = tempDir("clone-trunc")
    val src = base + "/src"
    val dst = base + "/dst"
    writeKeyed(src, 120, 30)
    val before = srcState(src)
    Maintenance.shallowClone(spark, src, dst)
    Maintenance.truncate(spark, dst) // drops every reference
    assert(PDataset.scanParquet(spark, dst).toDF.isEmpty)
    assert(srcState(src) == before)
    Maintenance.vacuum(spark, dst)
    assert(srcState(src) == before)
    assertSameRows(PDataset.scanParquet(spark, src).toDF, keyedDF(0, 120))
  }

  test("compact on the clone rewrites into local files; source intact") {
    val base = tempDir("clone-compact")
    val src = base + "/src"
    val dst = base + "/dst"
    writeKeyed(src, 300, 30)
    val before = srcState(src)
    Maintenance.shallowClone(spark, src, dst)
    val r = Maintenance.compact(spark, dst, targetRows = 100)
    assert(r.created == 3 && r.merged == 9, r.toString)
    assert(srcState(src) == before)
    val m = Sidecar.load(spark, dst)
    // merged runs localized; the lone sub-target leftover file is
    // untouched and still reads from the source
    assert(m.files.count(_.contains("/")) == 1, m.files.mkString(","))
    assertSameRows(PDataset.scanParquet(spark, dst).toDF, keyedDF(0, 300))
  }

  test("clone VERSION AS OF branches a retained snapshot") {
    val base = tempDir("clone-ver")
    val src = base + "/src"
    val dst = base + "/dst"
    writeKeyed(src, 120, 30)
    Maintenance.deleteRange(spark, src, Seq(Some(0L)), Seq(Some(30L)),
      retain = true) // v0 archived with all 120 rows
    Maintenance.shallowClone(spark, src, dst, version = Some(0))
    assertSameRows(PDataset.scanParquet(spark, dst).toDF, keyedDF(0, 120))
    assert(PDataset.scanParquet(spark, src).toDF.count() == 90)
  }

  test("clone inherits the pending deletion-vector overlay; " +
      "materialize on the clone stays local") {
    val base = tempDir("clone-dv")
    val src = base + "/src"
    val dst = base + "/dst"
    writeKeyed(src, 120, 30)
    val r = DeletionVectors.deleteWhere(spark, src, col("k") < 10L)
    assert(r.marked == 10)
    val before = srcState(src)
    Maintenance.shallowClone(spark, src, dst)
    // the clone hides exactly the rows the source hides
    assertSameRows(DeletionVectors.scan(spark, dst), keyedDF(10, 110))
    // materialize folds the clone's overlay into clone-LOCAL files
    DeletionVectors.materialize(spark, dst)
    assert(!DeletionVectors.exists(spark, dst))
    assert(srcState(src) == before)
    // the source's own overlay is independent and still pending
    assert(DeletionVectors.exists(spark, src))
    assertSameRows(DeletionVectors.scan(spark, src), keyedDF(10, 110))
    assertSameRows(PDataset.scanParquet(spark, dst).toDF, keyedDF(10, 110))
  }

  test("SQL: CREATE TABLE ... SHALLOW CLONE, idempotent under " +
      "IF NOT EXISTS, refuses an existing target without it") {
    val base = tempDir("clone-sql")
    val src = base + "/src"
    val dst = base + "/dst"
    writeKeyed(src, 120, 30)
    val out = spark.sql(
      s"CREATE TABLE graft.`$dst` SHALLOW CLONE graft.`$src`").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(4))
    assertSameRows(PDataset.scanParquet(spark, dst).toDF, keyedDF(0, 120))
    val again = spark.sql(
      s"CREATE TABLE IF NOT EXISTS graft.`$dst` SHALLOW CLONE " +
        s"graft.`$src`").collect()
    assert(again.map(_.getInt(0)).toSeq == Seq(0))
    // provenance + divergence meter surface in DESCRIBE DETAIL and
    // the per-file TVF
    val det = spark.sql(s"DESCRIBE DETAIL graft.`$dst`").head()
    assert(Option(det.getAs[String]("cloned_from")).exists(_.endsWith("/src")),
      det.toString)
    assert(det.getAs[Int]("external_files") == 4, det.toString)
    assert(spark.sql(
      s"SELECT count(*) AS n FROM graft_files('$dst') WHERE external")
      .head().getLong(0) == 4)
    assert(spark.sql(
      s"SELECT sum(rows) AS n FROM graft_files('$dst')")
      .head().getLong(0) == 120)
    val e = intercept[IllegalStateException] {
      spark.sql(s"CREATE TABLE graft.`$dst` SHALLOW CLONE graft.`$src`")
        .collect()
    }
    assert(e.getMessage.contains("already a graft table"))
  }

  test("SQL: VERSION AS OF clone through the parser") {
    val base = tempDir("clone-sqlver")
    val src = base + "/src"
    val dst = base + "/dst"
    writeKeyed(src, 120, 30)
    Maintenance.deleteRange(spark, src, Seq(Some(0L)), Seq(Some(30L)),
      retain = true)
    spark.sql(s"CREATE TABLE graft.`$dst` SHALLOW CLONE graft.`$src` " +
      "VERSION AS OF 0").collect()
    assert(PDataset.scanParquet(spark, dst).toDF.count() == 120)
  }

  test("time travel and the change feed work on a mutated clone " +
      "(archived generations list external entries)") {
    val base = tempDir("clone-cdf")
    val src = base + "/src"
    val dst = base + "/dst"
    writeKeyed(src, 120, 30)
    Maintenance.shallowClone(spark, src, dst)
    Maintenance.deleteRange(spark, dst, Seq(Some(0L)), Seq(Some(30L)),
      retain = true)
    Maintenance.updateWhere(spark, dst, col("k") >= 90L,
      Seq("payload" -> lit("X")), retain = true)
    // v0 = the pristine clone: an all-external archived listing reads
    assertSameRows(Maintenance.scanVersion(spark, dst, 0).toDF,
      keyedDF(0, 120))
    val feed = Maintenance.changes(spark, dst, 0)
      .groupBy("change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(feed == Map("delete" -> 30L, "update_preimage" -> 30L,
      "update_postimage" -> 30L), feed.toString)
    // and the source is still pristine
    assertSameRows(PDataset.scanParquet(spark, src).toDF, keyedDF(0, 120))
  }

  test("TIMESTAMP AS OF clone resolves the generation live then") {
    val base = tempDir("clone-ts")
    val src = base + "/src"
    writeKeyed(src, 120, 30)
    Maintenance.deleteRange(spark, src, Seq(Some(0L)), Seq(Some(30L)),
      retain = true)
    // the archive's mtime is the replacement instant: a ts before it
    // resolves to v0 (all 120 rows), one at/after to the current 90
    val (fs, p) = graft.core.GraftFs.resolve(spark, src)
    val archMtime = fs.getFileStatus(
      new org.apache.hadoop.fs.Path(p, "_graft_history/v0000000000.json"))
      .getModificationTime
    Maintenance.shallowCloneAsOf(spark, src, base + "/old", archMtime - 1)
    assert(PDataset.scanParquet(spark, base + "/old").toDF.count() == 120)
    spark.sql(s"CREATE TABLE graft.`$base/new` SHALLOW CLONE " +
      s"graft.`$src` TIMESTAMP AS OF '${archMtime + 1}'").collect()
    assert(PDataset.scanParquet(spark, base + "/new").toDF.count() == 90)
  }

  test("clone of a clone references the ORIGINAL files") {
    val base = tempDir("clone-chain")
    val src = base + "/src"
    val mid = base + "/mid"
    val dst = base + "/dst"
    writeKeyed(src, 120, 30)
    Maintenance.shallowClone(spark, src, mid)
    Maintenance.shallowClone(spark, mid, dst)
    val m1 = Sidecar.load(spark, mid)
    val m2 = Sidecar.load(spark, dst)
    assert(m2.files == m1.files) // verbatim: still the original bytes
    assertSameRows(PDataset.scanParquet(spark, dst).toDF, keyedDF(0, 120))
  }

  test("clone by CATALOG NAME: the target lands at its warehouse " +
      "path and is immediately readable by name") {
    val base = tempDir("clone-cat")
    spark.conf.set("spark.sql.catalog.gclone",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gclone.warehouse", base)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gclone.db")
    val df = keyedDF(0, 120)
    df.write.format("graft").option("index", "k")
      .save(base + "/db/srct")
    val out = spark.sql(
      "CREATE TABLE gclone.db.dstt SHALLOW CLONE gclone.db.srct")
      .head().getInt(0)
    assert(out >= 1)
    assertSameRows(spark.table("gclone.db.dstt"), df)
    // COW by name too: DELETE on the clone, source count intact
    spark.sql("DELETE FROM gclone.db.dstt WHERE k < 20")
    assert(spark.table("gclone.db.dstt").count() == 100)
    assert(spark.table("gclone.db.srct").count() == 120)
    // TVFs resolve catalog names through the same pure mapping
    assert(spark.sql(
      "SELECT sum(rows) AS n FROM graft_files('gclone.db.srct')")
      .head().getLong(0) == 120)
  }

  test("ANALYZE on a clone builds pruning sidecars its reads USE — " +
      "resolved from the table dir, keyed by base name, surviving " +
      "divergence and maintenance refresh") {
    val base = tempDir("clone-analyze")
    val src = base + "/src"
    val dst = base + "/dst"
    // v correlates with the index (v = 10k): per-file v-ranges are
    // disjoint, so a v filter can prune to one file; explicit 30-row
    // ranges pin the file boundaries exactly
    val parts = (0 until 300 by 30).map { lo =>
      PDataset.fromDataFrame(
        spark.range(lo.toLong, lo + 30L).select(
          col("id").as("k"), (col("id") * 10).as("v"),
          concat(lit("p"), col("id")).as("payload")), Seq("k"))
    }
    PDataset.concat(parts).writeParquet(src)
    val nFiles = Sidecar.load(spark, src).files.length
    Maintenance.shallowClone(spark, src, dst)
    spark.sql(s"ANALYZE TABLE graft.`$dst` COMPUTE STATISTICS " +
      "FOR COLUMNS (v)")
    spark.sql(s"ANALYZE TABLE graft.`$dst` COMPUTE BLOOM " +
      "FOR COLUMNS (payload)")
    // stats sidecars live in the CLONE dir; the files in the SOURCE —
    // pruning must still engage on the clone's reads
    val pruned = spark.read.format("graft").load(dst)
      .filter(col("v") >= 900L && col("v") < 1200L)
    assert(scannedFiles(pruned) == 1, s"of $nFiles files")
    assert(pruned.count() == 30L)
    val point = spark.read.format("graft").load(dst)
      .filter(col("payload") === "p250")
    assert(scannedFiles(point) == 1)
    assert(point.count() == 1L)
    // diverge (mixed source + local parents) and let maintenance
    // refresh the sidecars: external entries keep their base-name
    // entries, the rewritten band gets fresh ones, pruning persists
    Maintenance.updateWhere(spark, dst, col("k") < 30L,
      Seq("payload" -> concat(lit("q"), col("k"))))
    val pruned2 = spark.read.format("graft").load(dst)
      .filter(col("v") >= 900L && col("v") < 1200L)
    assert(scannedFiles(pruned2) == 1)
    assert(pruned2.count() == 30L)
    val point2 = spark.read.format("graft").load(dst)
      .filter(col("payload") === "q10")
    assert(scannedFiles(point2) == 1)
    assert(point2.count() == 1L)
    // the source never grew a sidecar of its own
    assert(!graft.core.ColumnStats.exists(spark, src))
  }

  test("source-side protection: a NON-retained source compact keeps " +
      "every byte a live clone references — the clone stays readable") {
    val base = tempDir("clone-protect")
    val src = base + "/src"
    val dst = base + "/dst"
    writeKeyed(src, 300, 30)
    Maintenance.shallowClone(spark, src, dst)
    // the clone registered a backlink marker in the source
    val markers = new java.io.File(src, "_graft_clones")
    assert(markers.isDirectory && markers.list().nonEmpty)
    val before = srcState(src)
    // a routine non-retained compact rewrites every source file; the
    // replaced originals were deleted immediately before the guard
    val r = Maintenance.compact(spark, src, targetRows = 300)
    assert(r.merged > 0, r.toString)
    before.keys.foreach { f =>
      assert(Files.exists(Paths.get(src, f)),
        s"clone-referenced $f deleted by the source compact")
    }
    assertSameRows(PDataset.scanParquet(spark, dst).toDF, keyedDF(0, 300))
    assertSameRows(PDataset.scanParquet(spark, src).toDF, keyedDF(0, 300))
    // ...and a source VACUUM (which deletes by directory listing, not
    // by replaced-candidate names) also keeps clone-referenced bytes
    Maintenance.vacuum(spark, src)
    before.keys.foreach { f =>
      assert(Files.exists(Paths.get(src, f)),
        s"clone-referenced $f deleted by the source vacuum")
    }
    assertSameRows(PDataset.scanParquet(spark, dst).toDF, keyedDF(0, 300))
  }

  test("stale backlinks self-clean: dropping the clone frees the " +
      "source's replaced files after the creation grace; inside the " +
      "grace (or on an unverifiable marker) maintenance FAILS SAFE") {
    val base = tempDir("clone-stale")
    val src = base + "/src"
    val dst = base + "/dst"
    writeKeyed(src, 120, 30)
    Maintenance.shallowClone(spark, src, dst)
    val before = srcState(src)
    // drop the clone wholesale (the operator has no deregister hook)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(dst))
    // INSIDE the grace a missing clone is indistinguishable from one
    // mid-creation: a non-retained rewrite keeps everything (fail
    // safe) and vacuum refuses loudly rather than deleting blind.
    Maintenance.compact(spark, src, targetRows = 120)
    assert(before.keys.forall(f => Files.exists(Paths.get(src, f))),
      "inside the grace, replaced files must be kept")
    val ev = intercept[IllegalArgumentException] {
      Maintenance.vacuum(spark, src)
    }
    assert(ev.getMessage.contains("clone backlink"), ev.getMessage)
    // past the grace the marker is verifiably stale: the sweep frees
    // the replaced originals and removes the marker
    val prevGrace = Maintenance.cloneMarkerGraceMs
    Maintenance.cloneMarkerGraceMs = 0L
    try {
      Maintenance.vacuum(spark, src)
      assert(before.keys.forall(f => !Files.exists(Paths.get(src, f))),
        "replaced files must free once no live clone references them")
      val markers = new java.io.File(src, "_graft_clones")
      assert(!markers.isDirectory || markers.list().isEmpty,
        "stale marker must self-clean")
    } finally Maintenance.cloneMarkerGraceMs = prevGrace
    assertSameRows(PDataset.scanParquet(spark, src).toDF, keyedDF(0, 120))
  }

  test("a fully LOCALIZED clone (copy-on-write rewrote every source " +
      "reference) releases its backlink; clone-of-clone registers " +
      "against the ORIGINAL owner of the bytes") {
    val base = tempDir("clone-localize")
    val src = base + "/src"
    val dst = base + "/dst"
    val dst2 = base + "/dst2"
    writeKeyed(src, 120, 30)
    Maintenance.shallowClone(spark, src, dst)
    // clone-of-clone: entries stay absolute into SRC, so the backlink
    // lands in SRC (the owner of the bytes), not in dst
    Maintenance.shallowClone(spark, dst, dst2)
    assert(!new java.io.File(dst, "_graft_clones").isDirectory ||
      new java.io.File(dst, "_graft_clones").list().isEmpty,
      "clone-of-clone must not register against the intermediate clone")
    assert(new java.io.File(src, "_graft_clones").list()
      .count(n => n.endsWith(".json") && !n.startsWith(".")) == 2,
      "both clones must register against the byte owner")
    // drop the second clone, then localize the first completely: every
    // band rewritten -> no external references remain
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(dst2))
    Maintenance.updateWhere(spark, dst, col("k") >= 0L,
      Seq("payload" -> concat(lit("x"), col("k"))))
    assert(Sidecar.load(spark, dst).files.forall(!_.contains("/")),
      "localization fixture must rewrite every band")
    val before = srcState(src)
    // source maintenance now sees both markers stale (the dropped
    // clone past the grace, the localized one immediately) ->
    // originals free
    val prevGrace = Maintenance.cloneMarkerGraceMs
    Maintenance.cloneMarkerGraceMs = 0L
    try Maintenance.compact(spark, src, targetRows = 120)
    finally Maintenance.cloneMarkerGraceMs = prevGrace
    assert(before.keys.forall(f => !Files.exists(Paths.get(src, f))),
      "files must free once every clone is localized or dropped")
    val markers = new java.io.File(src, "_graft_clones")
    assert(!markers.isDirectory || markers.list().isEmpty)
    // and the localized clone still reads its own bytes
    assert(PDataset.scanParquet(spark, dst).toDF
      .where(col("payload") === "x5").count() == 1L)
  }

  test("SHALLOW CLONE with an unresolvable identifier refuses with a " +
      "targeted error naming it, instead of falling through to " +
      "Spark's parser (whose unrelated syntax error hides the cause)") {
    val e = intercept[IllegalArgumentException] {
      spark.sql("CREATE TABLE nosuchcat.db.t SHALLOW CLONE graft.`/tmp/x`")
    }
    assert(e.getMessage.contains("nosuchcat.db.t") &&
      e.getMessage.contains("SHALLOW CLONE"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      spark.sql("CREATE TABLE graft.`/tmp/y` SHALLOW CLONE nosuchcat.db.s")
    }
    assert(e2.getMessage.contains("nosuchcat.db.s"), e2.getMessage)
    // NEITHER side touching graft delegates to the next parser (a
    // co-installed extension may own the statement) — Spark's own
    // parse error, not graft's targeted one
    val e3 = intercept[Exception] {
      spark.sql("CREATE TABLE other.db.t SHALLOW CLONE other.db.s")
    }
    assert(!e3.getMessage.contains("graft table"), e3.getMessage)
  }

  test("a clone's change feed starts at ITS OWN generation 0: " +
      "pre-clone source history is unreachable through the clone " +
      "(loud refusal), post-clone mutations feed normally") {
    val base = tempDir("clone-feed")
    val src = base + "/src"
    val dst = base + "/dst"
    writeKeyed(src, 120, 30)
    // give the SOURCE retained history (gens 0,1) before cloning
    Maintenance.updateWhere(spark, src, col("k") < 30L,
      Seq("payload" -> lit("s-edit1")), retain = true)
    Maintenance.updateWhere(spark, src, col("k") < 30L,
      Seq("payload" -> lit("s-edit2")), retain = true)
    assert(Maintenance.versions(spark, src) == Seq(0, 1))
    Maintenance.shallowClone(spark, src, dst)
    // generation 0 belongs to the SOURCE; the clone's history is empty
    val e = intercept[IllegalArgumentException] {
      Maintenance.changes(spark, dst, 0).collect()
    }
    assert(e.getMessage.contains("not retained") &&
      e.getMessage.contains("clone"), e.getMessage)
    val e2 = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_changes('$dst', 0)").collect()
    }
    assert(e2.getMessage.contains("not retained"), e2.getMessage)
    // a retained clone mutation opens the clone's OWN feed: v0 = the
    // clone point, and the feed shows only the clone's delta — none
    // of the source's pre-clone churn
    Maintenance.updateWhere(spark, dst, col("k") < 30L,
      Seq("payload" -> lit("c-edit")), retain = true)
    val feed = Maintenance.changes(spark, dst, 0)
    val byType = feed.groupBy("change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("update_preimage" -> 30L,
      "update_postimage" -> 30L), byType.toString)
    assert(feed.where(col("payload") === "s-edit1").count() == 0,
      "pre-clone source history must never surface in the clone's feed")
    // the preimages are the CLONE POINT's rows (the source's last
    // pre-clone content), read through the inherited external entries
    assert(feed.where(col("change_type") === "update_preimage" &&
      col("payload") === "s-edit2").count() == 30)
    // ...and the TVF agrees
    assert(spark.sql(s"SELECT count(*) AS n FROM graft_changes('$dst', 0)")
      .head().getLong(0) == 60L)
  }

  test("clone lifecycle closes: graft_clones lists registered " +
      "backlinks with live/ref counts, and dropClone deregisters — " +
      "the source's files free immediately, no grace wait") {
    val base = tempDir("clone-lifecycle")
    val src = base + "/src"
    val dst = base + "/dst"
    writeKeyed(src, 120, 30)
    Maintenance.shallowClone(spark, src, dst)
    // observability: one live backlink, all 4 bands still referenced
    val listed = spark.sql(s"SELECT * FROM graft_clones('$src')")
      .collect()
    assert(listed.length == 1, listed.mkString(","))
    assert(listed.head.getBoolean(2), "clone must list as live")
    assert(listed.head.getLong(3) == 4L,
      s"expected 4 external refs, got ${listed.head.getLong(3)}")
    // partial divergence shows up in the ref count
    Maintenance.updateWhere(spark, dst, col("k") < 30L,
      Seq("payload" -> lit("e")))
    assert(spark.sql(s"SELECT external_refs FROM graft_clones('$src')")
      .head().getLong(0) == 3L)
    // dropClone: backlink deregisters, so the next non-retained
    // source rewrite frees replaced files with NO grace override
    val before = srcState(src)
    Maintenance.dropClone(spark, dst)
    assert(spark.sql(s"SELECT * FROM graft_clones('$src')").count() == 0)
    Maintenance.compact(spark, src, targetRows = 120)
    assert(before.keys.forall(f => !Files.exists(Paths.get(src, f))),
      "replaced files must free immediately after dropClone")
    assertSameRows(PDataset.scanParquet(spark, src).toDF, keyedDF(0, 120))
  }

  test("clone carries CHECK constraints and refuses violating writes") {
    val base = tempDir("clone-check")
    val src = base + "/src"
    val dst = base + "/dst"
    writeKeyed(src, 120, 30)
    graft.operators.Constraints.add(spark, src, "pos", "k >= 0")
    Maintenance.shallowClone(spark, src, dst)
    assert(graft.operators.Constraints.list(spark, dst).contains("pos"))
    val bad = keyedDF(0, 5).withColumn("k", col("k") - lit(100L))
    val e = intercept[Exception] {
      PDataset.fromDataFrame(bad, Seq("k")).writeParquet(dst,
        append = true)
    }
    assert(e.getMessage.toLowerCase.contains("constraint") ||
      e.getMessage.contains("pos"))
  }
}
