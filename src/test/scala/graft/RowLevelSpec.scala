package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{PDataset, Sidecar}
import graft.operators.Maintenance
import Fixtures._

/** SQL `UPDATE` / `MERGE INTO` on graft catalog tables
  * ([[graft.plans.GraftRowLevelRewrite]] →
  * [[graft.operators.Maintenance.updateWhere]] / `merge`): statement
  * semantics, O(affected files) rewrite scope, and the loud
  * boundaries (non-key ON, key reassignment, snapshots). */
class RowLevelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val warehouse: String = {
    val wh = tempDir("graft-rowlevel-wh")
    spark.conf.set("spark.sql.catalog.grl",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grl.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS grl.db")
    wh
  }

  private var n = 0
  /** Fresh table `grl.db.<name>` of 120 rows in ~6 files, indexed on
    * k; returns (qualified name, directory). */
  private def freshTable(): (String, String) = {
    warehouse
    n += 1
    val name = s"t$n"
    val dir = s"$warehouse/db/$name"
    def part(lo: Long): PDataset =
      PDataset.fromDataFrame(
        spark.range(lo, lo + 20).select(col("id").as("k"),
          (col("id") % 7).as("grp"),
          (col("id") * 10).cast("double").as("v"),
          concat(lit("p"), col("id")).as("payload")), Seq("k"))
    PDataset.concat((0L until 120L by 20L).map(part)).writeParquet(dir)
    (s"grl.db.$name", dir)
  }

  private def rows(q: String): Seq[Row] = spark.sql(q).collect().toSeq

  test("MERGE WITH SCHEMA EVOLUTION: source-only columns widen the " +
      "table (metadata-only) before the clauses apply") {
    val (t, dir) = freshTable()
    spark.range(100, 130).select(col("id").as("k"),
      (col("id") * 100).cast("double").as("v"),
      concat(lit("tag"), col("id")).as("tag")) // NOT in the target
      .createOrReplaceTempView("evo_src")
    spark.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO $t
      USING evo_src s ON $t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v, tag = s.tag
      WHEN NOT MATCHED THEN INSERT (k, v, tag) VALUES (s.k, s.v, s.tag)""")
    // the widened column exists, nullable, null on untouched rows
    val m = Sidecar.load(spark, dir)
    assert(m.schema.fieldNames.contains("tag"), m.schema.treeString)
    val got = rows(s"SELECT k, v, tag, payload FROM $t ORDER BY k")
    assert(got.size == 130)
    got.foreach { r =>
      val k = r.getLong(0)
      if (k < 100) {
        assert(r.isNullAt(2), s"k=$k")
        assert(r.getString(3) == s"p$k")
      } else {
        assert(r.getString(2) == s"tag$k", s"k=$k")
        assert(r.getDouble(1) == k * 100.0)
        if (k < 120) assert(r.getString(3) == s"p$k") // updated row
        else assert(r.isNullAt(3)) // inserted row
      }
    }
    // WITHOUT the clause, an unknown assignment column still refuses
    val (t2, _) = freshTable()
    val e = intercept[Exception] {
      spark.sql(s"""MERGE INTO $t2 USING evo_src s ON $t2.k = s.k
        WHEN MATCHED THEN UPDATE SET tag = s.tag""")
    }
    assert(e.getMessage.toLowerCase.contains("tag"), e.getMessage)
  }

  test("MERGE WITH SCHEMA EVOLUTION: a WIDER source type widens the " +
      "target column metadata-only before the clauses apply") {
    warehouse
    spark.sql("CREATE TABLE grl.db.wevo (k BIGINT, cnt INT, " +
      "tag STRING) USING graft TBLPROPERTIES('index'='k')")
    (0 until 60 by 20).foreach { lo => // 3 appends -> 3 int32 files
      spark.sql("INSERT INTO grl.db.wevo " +
        s"SELECT id, CAST(id AS INT), CONCAT('t', id) " +
        s"FROM range($lo, ${lo + 20})")
    }
    val dir = s"$warehouse/db/wevo"
    val filesBefore = Sidecar.load(spark, dir).files.toSet
    // source cnt is BIGINT with a value an INT cannot hold
    spark.range(50, 70).select(col("id").as("k"),
      (col("id") + 4000000000L).as("cnt"),
      concat(lit("s"), col("id")).as("tag"))
      .createOrReplaceTempView("wevo_src")
    spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO grl.db.wevo t
      USING wevo_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET cnt = s.cnt, tag = s.tag
      WHEN NOT MATCHED THEN INSERT *""")
    val m = Sidecar.load(spark, dir)
    assert(m.schema("cnt").dataType.simpleString == "bigint",
      m.schema.treeString)
    // only the merge's affected band rewrote; the widen itself
    // touched no data file — untouched int32 files survive and read
    // back as bigint
    assert(filesBefore.intersect(m.files.toSet).nonEmpty,
      s"untouched narrow files must survive: before=$filesBefore " +
        s"after=${m.files.toSet}")
    val got = rows("SELECT k, cnt FROM grl.db.wevo ORDER BY k")
    assert(got.size == 70)
    got.foreach { r =>
      val k = r.getLong(0)
      if (k < 50) assert(r.getLong(1) == k, s"k=$k")
      else assert(r.getLong(1) == k + 4000000000L, s"k=$k")
    }
  }

  test("UPDATE ... WHERE updates matching rows, leaves the rest, and " +
      "rewrites only the files with hits") {
    val (t, dir) = freshTable()
    val before = Sidecar.load(spark, dir).files.toSet
    spark.sql(s"UPDATE $t SET v = v * 2, payload = 'upd' " +
      "WHERE k >= 40 AND k < 60")
    val got = rows(s"SELECT k, v, payload FROM $t ORDER BY k")
    assert(got.size == 120)
    got.foreach { r =>
      val k = r.getLong(0)
      if (k >= 40 && k < 60) {
        assert(r.getDouble(1) == k * 20.0, s"k=$k")
        assert(r.getString(2) == "upd")
      } else {
        assert(r.getDouble(1) == k * 10.0, s"k=$k")
        assert(r.getString(2) == s"p$k")
      }
    }
    // contiguous key band over 6 range files: only the overlapping
    // files were replaced
    val after = Sidecar.load(spark, dir).files.toSet
    val replaced = (before -- after).size
    assert(replaced >= 1 && replaced <= 2,
      s"expected 1-2 files rewritten for a 20-key band, got $replaced")
  }

  test("UPDATE without WHERE updates every row; arithmetic on the " +
      "updated column uses the OLD value") {
    val (t, _) = freshTable()
    spark.sql(s"UPDATE $t SET v = v + 1")
    val got = rows(s"SELECT k, v FROM $t ORDER BY k")
    got.foreach(r => assert(r.getDouble(1) == r.getLong(0) * 10.0 + 1))
  }

  test("UPDATE may assign the index column: files re-sort, bounds " +
      "recompute, reads stay correct") {
    val (t, dir) = freshTable()
    spark.sql(s"UPDATE $t SET k = k + 1000 WHERE k < 10")
    val got = rows(s"SELECT k FROM $t ORDER BY k").map(_.getLong(0))
    assert(got == ((10L until 120L) ++ (1000L until 1010L)).toSeq)
    // the rewritten file's recomputed bounds serve pruning correctly
    assert(rows(s"SELECT count(*) AS c FROM $t WHERE k >= 1000")
      .head.getLong(0) == 10L)
    checkBoundsAndSizes(PDataset.scanParquet(spark, dir))
  }

  test("UPDATE moving keys across divisions routes the movers: bounds " +
      "stay disjoint and a following keyed upsert succeeds") {
    val (t, dir) = freshTable() // 6 files of 20 consecutive keys
    val before = Sidecar.load(spark, dir)
    assert(before.files.length == 6)
    // keys 100..104 (last file) move to 5..9 (first file's range);
    // key 57 (file 2) moves to 117 (last file's range)
    spark.sql(s"UPDATE $t SET k = k - 95 WHERE k >= 100 AND k < 105")
    spark.sql(s"UPDATE $t SET k = 117, payload = 'moved' WHERE k = 57")
    val after = Sidecar.load(spark, dir)
    // disjoint sorted bounds survive the cross-division moves
    (0 until after.files.length - 1).foreach { i =>
      assert(graft.core.Lex.lexCmp(
        after.upperBounds(i), after.lowerBounds(i + 1)) < 0,
        s"bounds overlap between ${after.files(i)} and " +
          s"${after.files(i + 1)}")
    }
    assert(PDataset.scanParquet(spark, dir).isDisjoint)
    // duplicates by design: 5..9 now appear twice, 117 twice with the
    // mover carrying 'moved'
    val ks = rows(s"SELECT k FROM $t").map(_.getLong(0))
    assert(ks.size == 120)
    (5L to 9L).foreach(k => assert(ks.count(_ == k) == 2, s"k=$k"))
    assert(ks.count(_ == 117L) == 2)
    assert(!ks.contains(57L) && !ks.contains(100L))
    // an immediately-following keyed upsert (which requires disjoint
    // bounds and refuses on overlap) succeeds
    val r = Maintenance.upsert(spark, dir,
      spark.range(30, 33).selectExpr("id AS k", "id % 7 AS grp",
        "CAST(0 AS DOUBLE) AS v", "'ups' AS payload"))
    assert(r.rewritten >= 1)
    assert(rows(s"SELECT payload FROM $t WHERE k = 31")
      .head.getString(0) == "ups")
    checkBoundsAndSizes(PDataset.scanParquet(spark, dir))
  }

  test("UPDATE that empties a file of all its rows drops it from the " +
      "sidecar; untouched files keep their bytes") {
    val (t, dir) = freshTable()
    val beforeFiles = Sidecar.load(spark, dir).files.toSet
    // every row of the first file (k 0..19) moves into the 40..59
    // division
    spark.sql(s"UPDATE $t SET k = k + 45 WHERE k < 20")
    val after = Sidecar.load(spark, dir)
    assert(after.files.length == 5,
      s"the emptied source file must drop (got ${after.files.length})")
    assert(rows(s"SELECT count(*) AS c FROM $t").head.getLong(0) == 120)
    assert(rows(s"SELECT count(*) AS c FROM $t WHERE k >= 45 AND k < 65")
      .head.getLong(0) == 40)
    // only the source file and the two receiving files (45..59 land
    // in the 40-59 division, 60..64 in 60-79) were rewritten
    assert((beforeFiles intersect after.files.toSet).size == 3,
      "untouched files must keep their names (zero data I/O)")
    assert(PDataset.scanParquet(spark, dir).isDisjoint)
  }

  test("UPDATE enforces CHECK constraints on the post-update rows") {
    val (t, dir) = freshTable()
    graft.operators.Constraints.add(spark, dir, "v_pos", "v >= 0")
    intercept[graft.operators.Constraints.Violation] {
      spark.sql(s"UPDATE $t SET v = -1 WHERE k = 5")
    }
    // nothing changed
    assert(rows(s"SELECT v FROM $t WHERE k = 5").head.getDouble(0) == 50.0)
  }

  test("UPDATE on a snapshot relation refuses") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.plans.logical.{Assignment,
      UpdateTable}
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
    val (_, dir) = freshTable()
    graft.operators.Maintenance.upsert(spark, dir,
      spark.range(0, 1).select(lit(5L).as("k"), lit(0L).as("grp"),
        lit(1.0).as("v"), lit("x").as("payload")),
      retain = true)
    val gt = new graft.sources.GraftTable(dir, "t@v0",
      graft.operators.Maintenance.versionMeta(spark, dir, 0),
      snapshot = true)
    val rel = DataSourceV2Relation.create(gt, None, None)
    val plan = UpdateTable(rel,
      Seq(Assignment(rel.output.head, Literal(1L))), None)
    val e = intercept[UnsupportedOperationException] {
      new graft.plans.GraftRowLevelRewrite(spark).apply(plan)
    }
    assert(e.getMessage.contains("snapshot"))
  }

  test("MERGE INTO: matched-and update, matched-and delete, not " +
      "matched insert — one commit, first clause wins") {
    val (t, _) = freshTable()
    // source: keys 100..139 — 100..119 exist (update or delete),
    // 120..139 are new (insert)
    spark.range(100, 140).select(col("id").as("k"),
      (col("id") % 2 === 0).as("drop_it"),
      (col("id") * 100).cast("double").as("nv"))
      .createOrReplaceTempView("merge_src")
    spark.sql(s"""MERGE INTO $t USING merge_src s ON $t.k = s.k
      WHEN MATCHED AND s.drop_it THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = s.nv
      WHEN NOT MATCHED AND NOT s.drop_it THEN
        INSERT (k, grp, v) VALUES (s.k, -1, s.nv)""")
    val got = rows(s"SELECT k, grp, v, payload FROM $t ORDER BY k")
    val byK = got.map(r => r.getLong(0) -> r).toMap
    // matched evens deleted
    (100L until 120L by 2).foreach(k => assert(!byK.contains(k), s"k=$k"))
    // matched odds updated in place (payload survives)
    (101L until 120L by 2).foreach { k =>
      assert(byK(k).getDouble(2) == k * 100.0)
      assert(byK(k).getString(3) == s"p$k")
      assert(byK(k).getLong(1) == k % 7)
    }
    // unmatched odds inserted with nulls for unassigned columns
    (121L until 140L by 2).foreach { k =>
      assert(byK(k).getLong(1) == -1L)
      assert(byK(k).getDouble(2) == k * 100.0)
      assert(byK(k).isNullAt(3))
    }
    // unmatched evens skipped by the insert condition
    (120L until 140L by 2).foreach(k => assert(!byK.contains(k)))
    // untouched rows intact
    assert(byK(50L).getDouble(2) == 500.0)
    assert(got.size == 120 - 10 + 10)
  }

  test("MERGE INTO: WHEN NOT MATCHED BY SOURCE THEN DELETE gives " +
      "sync-to-source") {
    val (t, _) = freshTable()
    spark.range(0, 130).filter(col("id") % 3 === 0)
      .select(col("id").as("k"), (col("id") * 5).cast("double").as("nv"))
      .createOrReplaceTempView("sync_src")
    spark.sql(s"""MERGE INTO $t USING sync_src s ON $t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.nv
      WHEN NOT MATCHED THEN INSERT (k, grp, v) VALUES (s.k, 0, s.nv)
      WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    val got = rows(s"SELECT k, v FROM $t ORDER BY k")
    assert(got.map(_.getLong(0)) == (0L until 130L by 3).toSeq)
    got.foreach(r => assert(r.getDouble(1) == r.getLong(0) * 5.0))
  }

  test("MERGE INTO an empty table is an initial load through the " +
      "insert clauses") {
    warehouse
    spark.sql("CREATE TABLE grl.db.fresh (k BIGINT, grp BIGINT, " +
      "v DOUBLE, payload STRING) USING graft " +
      "TBLPROPERTIES('index'='k')")
    spark.range(0, 25).select(col("id").as("k"), lit(1L).as("grp"),
      (col("id") * 2).cast("double").as("nv"))
      .createOrReplaceTempView("fresh_src")
    spark.sql("""MERGE INTO grl.db.fresh USING fresh_src s
      ON grl.db.fresh.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.nv
      WHEN NOT MATCHED THEN INSERT (k, grp, v) VALUES (s.k, s.grp, s.nv)""")
    val got = rows("SELECT k, grp, v, payload FROM grl.db.fresh ORDER BY k")
    assert(got.size == 25)
    got.foreach { r =>
      assert(r.getLong(1) == 1L)
      assert(r.getDouble(2) == r.getLong(0) * 2.0)
      assert(r.isNullAt(3))
    }
    // and a second MERGE now takes the keyed path
    spark.sql("""MERGE INTO grl.db.fresh USING fresh_src s
      ON grl.db.fresh.k = s.k
      WHEN MATCHED AND s.k < 5 THEN DELETE""")
    assert(spark.table("grl.db.fresh").count() == 20L)
  }

  test("MERGE ON clause must cover every index column with a key " +
      "equality; residual conjuncts alone do not count") {
    val (t, _) = freshTable()
    spark.range(0, 5).select(col("id").as("k"),
      (col("id") * 1.0).as("nv")).createOrReplaceTempView("bad_src")
    val e1 = intercept[Exception] {
      spark.sql(s"""MERGE INTO $t USING bad_src s ON $t.grp = s.k
        WHEN MATCHED THEN UPDATE SET v = s.nv""")
    }
    assert(e1.getMessage.contains("index column"))
    // a residual-shaped conjunct on the index column (not a bare
    // equality) leaves it uncovered — still refused
    val e2 = intercept[Exception] {
      spark.sql(s"""MERGE INTO $t USING bad_src s
        ON $t.k > s.k AND $t.grp = 0
        WHEN MATCHED THEN UPDATE SET v = s.nv""")
    }
    assert(e2.getMessage.contains("index column"))
  }

  test("MERGE residual ON conjuncts get full SQL semantics: " +
      "key-matched rows failing the residual are NOT MATCHED") {
    val (t, _) = freshTable()
    // target grp = k % 7; source says grp for half its rows matches
    spark.range(0, 10).select(col("id").as("k"),
      (col("id") % 7).as("sgrp"), (col("id") * 1.0).as("nv"))
      .createOrReplaceTempView("res_src")
    // residual `t.grp = s.sgrp` holds for all; `AND s.k < 5` (a
    // source-only residual) narrows the matched set to k 0-4
    spark.sql(s"""MERGE INTO $t USING res_src s
      ON $t.k = s.k AND $t.grp = s.sgrp AND s.k < 5
      WHEN MATCHED THEN UPDATE SET v = s.nv
      WHEN NOT MATCHED BY SOURCE AND $t.k < 12 THEN DELETE""")
    // k 0-4 updated; k 5-9 key-matched but residual-failed => NOT
    // MATCHED BY SOURCE, but they fail the `< 12` guard except 5-9
    // ... all of 5-9 >= 12 is false, so 5-9 ARE < 12 => deleted; 10,
    // 11 deleted too; k >= 12 untouched
    val out = rows(s"SELECT k, v FROM $t ORDER BY k").map(r =>
      (r.getLong(0), r.getDouble(1)))
    assert(out.take(5) == Seq((0L, 0.0), (1L, 1.0), (2L, 2.0),
      (3L, 3.0), (4L, 4.0)))
    assert(!out.map(_._1).exists(k => k >= 5 && k < 12))
    assert(out.count(_._1 >= 12) == 108)
  }

  test("MERGE residual refusals: insert-key collision and " +
      "duplicate-key targets read by the residual") {
    val (t, _) = freshTable()
    // source row k=3 exists in the target but fails the residual
    // (grp mismatch): a WHEN NOT MATCHED insert would duplicate k=3
    spark.sql("SELECT 3L AS k, 99L AS sgrp, 1.0 AS nv")
      .createOrReplaceTempView("coll_src")
    val e1 = intercept[Exception] {
      spark.sql(s"""MERGE INTO $t USING coll_src s
        ON $t.k = s.k AND $t.grp = s.sgrp
        WHEN MATCHED THEN UPDATE SET v = s.nv
        WHEN NOT MATCHED THEN INSERT (k, grp, v, payload)
          VALUES (s.k, s.sgrp, s.nv, 'new')""")
    }
    assert(e1.getMessage.contains("duplicate those keys"),
      e1.getMessage)
    // without the insert clause the same residual MERGE is fine
    spark.sql(s"""MERGE INTO $t USING coll_src s
      ON $t.k = s.k AND $t.grp = s.sgrp
      WHEN MATCHED THEN UPDATE SET v = s.nv""")
    assert(rows(s"SELECT v FROM $t WHERE k = 3").head.getDouble(0)
      == 30.0, "residual-failed pair must stay un-updated")

    // duplicate-key target + residual reading target non-key data:
    // a partially-matched key would lose its sibling => refused
    val dupDir = tempDir("rowlevel-dup") + "/ds"
    PDataset.fromDataFrame(
      Seq((1L, "a", 1.0), (1L, "b", 2.0), (2L, "a", 3.0))
        .toDF("k", "tag", "v"), Seq("k")).writeParquet(dupDir)
    val src2 = Seq((1L, "a", 9.0)).toDF("k", "tag", "nv")
    src2.createOrReplaceTempView("dup_src")
    val td = s"grl.`$dupDir`"
    val e2 = intercept[Exception] {
      spark.sql(s"""MERGE INTO $td t USING dup_src s
        ON t.k = s.k AND t.tag = s.tag
        WHEN MATCHED THEN UPDATE SET v = s.nv""")
    }
    assert(e2.getMessage.contains("duplicate"), e2.getMessage)
    assert(rows(s"SELECT v FROM $td WHERE k = 1 ORDER BY v")
      .map(_.getDouble(0)) == Seq(1.0, 2.0), "nothing applied")
  }

  test("MERGE UPDATE may not reassign an index column") {
    val (t, _) = freshTable()
    spark.range(0, 5).select(col("id").as("k"),
      (col("id") * 1.0).as("nv")).createOrReplaceTempView("key_src")
    val e = intercept[Exception] {
      spark.sql(s"""MERGE INTO $t USING key_src s ON $t.k = s.k
        WHEN MATCHED THEN UPDATE SET k = s.k + 1""")
    }
    assert(e.getMessage.contains("index column"))
  }

  test("UPDATE with a subquery condition refuses loudly") {
    val (t, _) = freshTable()
    val e = intercept[Exception] {
      spark.sql(s"UPDATE $t SET v = 0 WHERE k IN " +
        s"(SELECT k FROM $t WHERE grp = 0)")
    }
    assert(e.getMessage.contains("subquer"))
  }

  test("path identifiers: UPDATE / DELETE / MERGE / SELECT on " +
      "grl.`/abs/path` bypass the warehouse mapping") {
    warehouse // registers the grl catalog
    val dir = tempDir("graft-rl-pathident") + "/ds"
    def part(lo: Long): PDataset =
      PDataset.fromDataFrame(
        spark.range(lo, lo + 20).select(col("id").as("k"),
          (col("id") * 10).cast("double").as("v")), Seq("k"))
    PDataset.concat((0L until 60L by 20L).map(part)).writeParquet(dir)
    val t = s"grl.`$dir`"
    assert(spark.sql(s"SELECT count(*) AS n FROM $t").head.getLong(0)
      == 60L)
    spark.sql(s"UPDATE $t SET v = 0 WHERE k < 10")
    assert(spark.sql(s"SELECT sum(v) AS s FROM $t WHERE k < 10")
      .head.getDouble(0) == 0.0)
    spark.range(0, 5).selectExpr("id + 100 AS k", "id * 1.0 AS nv")
      .createOrReplaceTempView("path_src")
    spark.sql(s"""MERGE INTO $t USING path_src s ON $t.k = s.k
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.nv)""")
    assert(spark.sql(s"SELECT count(*) AS n FROM $t").head.getLong(0)
      == 65L)
    spark.sql(s"DELETE FROM $t WHERE k >= 100")
    assert(spark.sql(s"SELECT count(*) AS n FROM $t").head.getLong(0)
      == 60L)
  }

  test("REPLACE WHERE: scoped overwrite in one commit — only the " +
      "files with matching rows move; out-of-scope rows refuse") {
    val (t, dir) = freshTable()
    val before = Sidecar.load(spark, dir).files.toSet
    spark.range(45, 55).selectExpr("id AS k", "CAST(0 AS BIGINT) AS grp",
      "CAST(-1.0 AS DOUBLE) AS v", "'replaced' AS payload")
      .createOrReplaceTempView("rw_src")
    // SQL form: INSERT INTO ... REPLACE WHERE
    spark.sql(s"INSERT INTO $t REPLACE WHERE k >= 40 AND k < 60 " +
      "SELECT * FROM rw_src")
    val got = rows(s"SELECT k, v, payload FROM $t ORDER BY k")
    assert(got.map(_.getLong(0)) ==
      ((0L until 40L) ++ (45L until 55L) ++ (60L until 120L)).toSeq)
    got.foreach { r =>
      val k = r.getLong(0)
      if (k >= 45 && k < 55) assert(r.getString(2) == "replaced")
      else assert(r.getString(2) == s"p$k")
    }
    // only the 40..60 band's files were replaced
    val after = Sidecar.load(spark, dir).files.toSet
    assert((before intersect after).size >= 4,
      "files outside the replaced band must not move")
    // rows outside the predicate refuse the whole commit
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO $t REPLACE WHERE k < 10 " +
        "SELECT 500 AS k, CAST(0 AS BIGINT) AS grp, " +
        "CAST(1.0 AS DOUBLE) AS v, 'x' AS payload")
    }
    assert(e.getMessage.contains("REPLACE WHERE") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("REPLACE WHERE"))
    assert(spark.table(t).count() == got.size.toLong)
  }

  test("writeTo(...).overwrite(cond) takes the same replaceWhere path") {
    val (t, _) = freshTable()
    spark.range(100, 120).selectExpr("id AS k", "CAST(1 AS BIGINT) AS grp",
      "CAST(7.0 AS DOUBLE) AS v", "'ow' AS payload")
      .writeTo(t).overwrite(col("k") >= 100)
    val got = rows(s"SELECT k, payload FROM $t ORDER BY k")
    assert(got.size == 120)
    got.foreach { r =>
      if (r.getLong(0) >= 100) assert(r.getString(1) == "ow")
      else assert(r.getString(1) == s"p${r.getLong(0)}")
    }
  }

  test("spark.graft.sql.retain=true makes SQL UPDATE and MERGE " +
      "retained commits: time travel and the change feed cross them") {
    val (t, dir) = freshTable()
    spark.conf.set(graft.plans.GraftRowLevel.SqlRetainKey, "true")
    try {
      spark.sql(s"UPDATE $t SET v = 0 WHERE k < 20")
      val h1 = Maintenance.history(spark, dir).collect()
      assert(h1.length == 2, "the SQL UPDATE must retain a generation")
      // time travel still sees the pre-update values
      assert(rows(s"SELECT v FROM $t VERSION AS OF 0 WHERE k = 5")
        .head.getDouble(0) == 50.0)
      // the change feed crosses the SQL mutation (a caught-up CDF
      // consumer survives it — Delta semantics)
      val ch = Maintenance.changes(spark, dir, 0).collect()
      assert(ch.nonEmpty)
      spark.range(0, 3).selectExpr("id AS k", "CAST(-1 AS DOUBLE) AS nv")
        .createOrReplaceTempView("retain_src")
      spark.sql(s"MERGE INTO $t USING retain_src s ON $t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET v = s.nv")
      assert(Maintenance.history(spark, dir).collect().length == 3,
        "the SQL MERGE must retain a generation")
      assert(rows(s"SELECT v FROM $t VERSION AS OF 1 WHERE k = 1")
        .head.getDouble(0) == 0.0)
    } finally spark.conf.unset(graft.plans.GraftRowLevel.SqlRetainKey)
    // without the conf the commit is non-retained (the default)
    val (t2, dir2) = freshTable()
    spark.sql(s"UPDATE $t2 SET v = 0 WHERE k < 20")
    assert(Maintenance.history(spark, dir2).collect().length == 1)
  }

  test("MERGE with multiple source rows per target key raises the " +
      "cardinality error naming the duplicated keys") {
    val (t, _) = freshTable()
    // key 10 appears twice in the source
    spark.createDataFrame(Seq((10L, 1.0), (10L, 2.0), (11L, 3.0)))
      .toDF("k", "nv").createOrReplaceTempView("dup_src")
    val e = intercept[Exception] {
      spark.sql(s"MERGE INTO $t USING dup_src s ON $t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET v = s.nv")
    }
    val msg = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).flatMap(x => Option(x.getMessage))
      .mkString("\n")
    assert(msg.contains("multiple source rows matched"), msg)
    assert(msg.contains("k=10"), s"the error must name the key: $msg")
    assert(!msg.contains("k=11"), s"unique keys are not ambiguous: $msg")
    // an UPDATE + DELETE landing on the same key is named too
    spark.createDataFrame(Seq((20L, 1.0, false), (20L, 0.0, true)))
      .toDF("k", "nv", "del").createOrReplaceTempView("dup_src2")
    val e2 = intercept[Exception] {
      spark.sql(s"MERGE INTO $t USING dup_src2 s ON $t.k = s.k " +
        "WHEN MATCHED AND s.del THEN DELETE " +
        "WHEN MATCHED THEN UPDATE SET v = s.nv")
    }
    val msg2 = Iterator.iterate(e2: Throwable)(_.getCause)
      .takeWhile(_ != null).flatMap(x => Option(x.getMessage))
      .mkString("\n")
    assert(msg2.contains("multiple source rows matched"), msg2)
    assert(msg2.contains("k=20"), msg2)
  }

  test("SQL DELETE (DV overlay) then SQL UPDATE on the same band: " +
      "both effects land, the folded marks clear") {
    val (t, dir) = freshTable() // 120 rows, 6 files of 20
    spark.sql(s"DELETE FROM $t WHERE k >= 45 AND k < 50")
    assert(graft.operators.DeletionVectors.exists(spark, dir))
    // the UPDATE band overlaps the deleted band's file (40-59)
    spark.sql(s"UPDATE $t SET payload = 'upd' WHERE k >= 40 AND k < 55")
    assert(!graft.operators.DeletionVectors.exists(spark, dir),
      "the update rewrote the only marked file; its marks must fold")
    val got = rows(s"SELECT k, payload FROM $t ORDER BY k")
    assert(got.size == 115)
    assert(!got.exists(r => r.getLong(0) >= 45 && r.getLong(0) < 50),
      "folded deletes must not resurrect")
    got.foreach { r =>
      val k = r.getLong(0)
      if (k >= 40 && k < 55) assert(r.getString(1) == "upd", s"k=$k")
      else assert(r.getString(1) == s"p$k", s"k=$k")
    }
    // MERGE over a band with pending marks folds the same way
    spark.sql(s"DELETE FROM $t WHERE k = 100")
    spark.range(100, 103).selectExpr("id AS k", "CAST(9 AS DOUBLE) AS nv")
      .createOrReplaceTempView("dvfold_src")
    spark.sql(s"MERGE INTO $t USING dvfold_src s ON $t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET v = s.nv " +
      "WHEN NOT MATCHED THEN INSERT (k, grp, v) VALUES (s.k, -1, s.nv)")
    assert(!graft.operators.DeletionVectors.exists(spark, dir))
    val after = rows(s"SELECT k, grp, v FROM $t WHERE k >= 100 AND " +
      "k < 103 ORDER BY k")
    // k=100 was DV-deleted, so the MERGE sees it as NOT MATCHED and
    // re-inserts it with grp = -1; 101/102 update in place
    assert(after.map(_.getLong(0)) == Seq(100L, 101L, 102L))
    assert(after.head.getLong(1) == -1L)
    assert(after.map(_.getDouble(2)) == Seq(9.0, 9.0, 9.0))
  }

  test("non-deterministic UPDATE conditions refuse (the rewrite " +
      "evaluates them in more than one pass)") {
    val (t, _) = freshTable()
    val e = intercept[Exception] {
      spark.sql(s"UPDATE $t SET v = 0 WHERE rand() < 0.5")
    }
    assert(e.getMessage.contains("deterministic"), e.getMessage)
  }

  test("SQL flow: DELETE FROM leaves deletion vectors; UPDATE folds " +
      "the affected files' marks; OPTIMIZE materializes the rest") {
    val (t, dir) = freshTable()
    spark.sql(s"DELETE FROM $t WHERE k < 10")
    assert(spark.table(t).count() == 110)
    // UPDATE on the marked file folds its marks in place (no
    // materialize step needed); marks elsewhere stay pending
    spark.sql(s"DELETE FROM $t WHERE k = 115")
    spark.sql(s"UPDATE $t SET v = -5 WHERE k = 50")
    assert(rows(s"SELECT v FROM $t WHERE k = 50").head.getDouble(0)
      == -5.0)
    assert(graft.operators.DeletionVectors.exists(spark, dir),
      "marks in files the UPDATE never touched must stay pending")
    // OPTIMIZE materializes whatever is still pending, then compacts
    spark.sql(s"OPTIMIZE $t TARGET 100000 ROWS")
    assert(!graft.operators.DeletionVectors.exists(spark, dir))
    assert(spark.table(t).count() == 109)
    assert(rows(s"SELECT count(*) AS n FROM $t WHERE k < 10")
      .head.getLong(0) == 0L)
    assert(rows(s"SELECT v FROM $t WHERE k = 50").head.getDouble(0)
      == -5.0)
  }
}
