package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{PDataset, Sidecar}
import graft.operators.CopyInto
import Fixtures._

/** COPY INTO — idempotent incremental file ingestion: each landing
  * file loads exactly once across re-runs (ledger in the sidecar,
  * committed WITH the data), changed source files refuse, FORCE
  * re-loads by intent, columns align by name with casts, and the SQL
  * statement reports the load counts. */
class CopyIntoSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def keyedDF(lo: Long, n: Long): DataFrame =
    spark.range(lo, lo + n).select(
      col("id").as("k"),
      (col("id") % 7).cast("int").as("grp"),
      concat(lit("v"), col("id")).as("payload"))

  private def mkTable(dir: String): Unit =
    PDataset.fromDataFrame(keyedDF(0, 100), Seq("k")).writeParquet(dir)

  private def land(dir: String, name: String, df: DataFrame): Unit =
    graft.core.Sidecar.writeSingleParquet(
      df, Paths.get(dir, name).toString)

  test("re-runs load each landing file exactly once; new drops load " +
      "incrementally; the SQL statement reports counts") {
    val root = tempDir("copyinto")
    val table = root + "/t"
    val landing = root + "/landing"
    Files.createDirectories(Paths.get(landing))
    mkTable(table)
    land(landing, "a.parquet", keyedDF(100, 50))
    land(landing, "b.parquet", keyedDF(150, 50))

    val r1 = CopyInto.copyInto(spark, table, landing, "parquet")
    assert(r1 == CopyInto.Report(2, 0, 2, 100L), r1.toString)
    assert(PDataset.scanParquet(spark, table).toDF.count() == 200)

    // idempotent re-run: nothing loads
    val r2 = CopyInto.copyInto(spark, table, landing, "parquet")
    assert(r2 == CopyInto.Report(2, 2, 0, 0L), r2.toString)
    assert(PDataset.scanParquet(spark, table).toDF.count() == 200)

    // a new drop loads alone — O(new files), not O(landing zone)
    land(landing, "c.parquet", keyedDF(200, 25))
    val row = spark.sql(s"COPY INTO graft.`$table` FROM '$landing' " +
      "FILEFORMAT = PARQUET").head()
    assert(row.getInt(0) == 3 && row.getInt(1) == 2 &&
      row.getInt(2) == 1 && row.getLong(3) == 25L, row.toString)
    val after = PDataset.scanParquet(spark, table).toDF
    assert(after.count() == 225)
    assert(after.agg(countDistinct(col("k"))).head().getLong(0) == 225)

    // `_`/`.`-prefixed and non-matching-pattern files never load
    land(landing, "_inflight.parquet", keyedDF(900, 5))
    land(landing, "notes.txt.parquet", keyedDF(900, 5))
    val r3 = CopyInto.copyInto(spark, table, landing, "parquet",
      pattern = "[abc].parquet")
    assert(r3 == CopyInto.Report(3, 3, 0, 0L), r3.toString)
  }

  test("a changed already-loaded file refuses; FORCE re-loads " +
      "everything (duplicates by intent)") {
    val root = tempDir("copyinto-changed")
    val table = root + "/t"
    val landing = root + "/landing"
    Files.createDirectories(Paths.get(landing))
    mkTable(table)
    land(landing, "a.parquet", keyedDF(100, 40))
    assert(CopyInto.copyInto(spark, table, landing, "parquet")
      .filesLoaded == 1)

    // rewrite the landed file with different CONTENT (size changes)
    land(landing, "a.parquet", keyedDF(100, 60))
    val e = intercept[IllegalStateException] {
      CopyInto.copyInto(spark, table, landing, "parquet")
    }
    assert(e.getMessage.contains("changed since they were ingested"),
      e.getMessage)

    val rf = CopyInto.copyInto(spark, table, landing, "parquet",
      force = true)
    assert(rf.filesLoaded == 1 && rf.rowsLoaded == 60L, rf.toString)
    // 100 base + 40 first load + 60 forced re-load
    assert(PDataset.scanParquet(spark, table).toDF.count() == 200)
  }

  test("columns align by NAME with casts; missing or extra columns " +
      "refuse; CSV takes the table schema with FORMAT_OPTIONS") {
    val root = tempDir("copyinto-schema")
    val table = root + "/t"
    val landing = root + "/landing"
    val landingCsv = root + "/landing-csv"
    Files.createDirectories(Paths.get(landing))
    mkTable(table)

    // reordered + re-cased + int-typed key: aligns and casts
    land(landing, "re.parquet", keyedDF(100, 10).select(
      col("payload"), col("grp").cast("long").as("GRP"),
      col("k").cast("int").as("K")))
    val r = CopyInto.copyInto(spark, table, landing, "parquet")
    assert(r.filesLoaded == 1 && r.rowsLoaded == 10L)
    val got = PDataset.scanParquet(spark, table).toDF
      .filter(col("k") >= 100).orderBy("k").collect()
    assert(got.length == 10 && got.head.getLong(0) == 100L &&
      got.head.getString(2) == "v100")

    // an extra source column refuses
    land(landing, "extra.parquet",
      keyedDF(200, 5).withColumn("junk", lit(1)))
    val e = intercept[IllegalArgumentException] {
      CopyInto.copyInto(spark, table, landing, "parquet")
    }
    assert(e.getMessage.contains("match the table's columns"),
      e.getMessage)

    // CSV: no inference — the table's schema applies, options pass
    Files.createDirectories(Paths.get(landingCsv))
    Files.write(Paths.get(landingCsv, "d.csv"),
      "k;grp;payload\n300;2;v300\n301;3;v301\n"
        .getBytes("UTF-8"))
    val rc = spark.sql(s"COPY INTO graft.`$table` FROM '$landingCsv' " +
      "FILEFORMAT = CSV PATTERN = '*.csv' " +
      "FORMAT_OPTIONS('header'='true', 'sep'=';')").head()
    assert(rc.getInt(2) == 1 && rc.getLong(3) == 2L, rc.toString)
    assert(PDataset.scanParquet(spark, table).toDF
      .filter(col("k") === 301).head().getString(2) == "v301")
  }

  test("FILEFORMAT = TAR ingests WebDataset shards: member stems cast " +
      "onto the index column, exactly-once re-runs, text-column " +
      "disambiguation required on wide tables") {
    import spark.implicits._
    val root = tempDir("copyinto-tar")
    val table = root + "/t"
    val landing = root + "/landing"
    val docs = (0L until 50L).map(i => (i, s"doc $i body")).toDF(
      "doc_id", "text")
    PDataset.fromDataFrame(docs.filter(col("doc_id") < 10), Seq("doc_id"))
      .reindex(Seq("doc_id")).writeParquet(table)
    graft.operators.Export.writeTarShards(
      docs.filter(col("doc_id") >= 10), "doc_id", "text", landing,
      numShards = 3, seed = "e1")

    val r1 = CopyInto.copyInto(spark, table, landing, "tar")
    assert(r1.filesLoaded == 3 && r1.rowsLoaded == 40, r1.toString)
    // exactly-once: the immediate re-run loads nothing
    val r2 = CopyInto.copyInto(spark, table, landing, "tar")
    assert(r2.filesLoaded == 0, r2.toString)
    val got = spark.read.format("graft").load(table)
      .as[(Long, String)].collect().toMap
    assert(got == docs.as[(Long, String)].collect().toMap)

    // a THREE-column table needs the text column named
    val wide = root + "/wide"
    PDataset.fromDataFrame(
      docs.withColumn("extra", lit(1L)).filter(col("doc_id") < 5),
      Seq("doc_id")).reindex(Seq("doc_id")).writeParquet(wide)
    val e = intercept[IllegalArgumentException] {
      CopyInto.copyInto(spark, wide, landing, "tar")
    }
    assert(e.getMessage.contains("text"), e.getMessage)
    // ...and FORMAT_OPTIONS names it; the missing 'extra' column then
    // refuses on the standard name-match contract
    val e2 = intercept[IllegalArgumentException] {
      CopyInto.copyInto(spark, wide, landing, "tar",
        formatOptions = Map("text" -> "text"))
    }
    assert(e2.getMessage.contains("missing"), e2.getMessage)
  }

  test("FILEFORMAT = TAR with FORMAT_OPTIONS('members') reassembles " +
      "multi-member samples by stem into a wide table; binary columns " +
      "roundtrip raw") {
    import spark.implicits._
    val root = tempDir("copyinto-tarm")
    val table = root + "/t"
    val landing = root + "/landing"
    val docs = (0L until 40L).map(i =>
      (i, s"body $i", s"""{"n":$i}""", Array[Byte](i.toByte, -1)))
      .toDF("doc_id", "text", "meta", "payload")
    PDataset.fromDataFrame(docs.filter(col("doc_id") < 5), Seq("doc_id"))
      .reindex(Seq("doc_id")).writeParquet(table)
    graft.operators.Export.writeTarShards(
      docs.filter(col("doc_id") >= 5), "doc_id",
      Seq("text" -> "txt", "meta" -> "json", "payload" -> "bin"),
      landing, numShards = 3, seed = "e1")

    val r1 = CopyInto.copyInto(spark, table, landing, "tar",
      formatOptions =
        Map("members" -> "txt:text, json:meta, bin:payload"))
    assert(r1.filesLoaded == 3 && r1.rowsLoaded == 35, r1.toString)
    val r2 = CopyInto.copyInto(spark, table, landing, "tar",
      formatOptions =
        Map("members" -> "txt:text, json:meta, bin:payload"))
    assert(r2.filesLoaded == 0, "re-run must be exactly-once")
    val got = spark.read.format("graft").load(table)
      .as[(Long, String, String, Array[Byte])].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4.toSeq))).toMap
    val want = docs.as[(Long, String, String, Array[Byte])].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4.toSeq))).toMap
    assert(got == want)

    // malformed specs refuse loudly
    val e = intercept[IllegalArgumentException] {
      CopyInto.copyInto(spark, table, landing, "tar",
        formatOptions = Map("members" -> "txt:text,oops"), force = true)
    }
    assert(e.getMessage.contains("<ext>:<col>"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      CopyInto.copyInto(spark, table, landing, "tar",
        formatOptions = Map("members" -> "txt:nosuch"), force = true)
    }
    assert(e2.getMessage.contains("nosuch"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      CopyInto.copyInto(spark, table, landing, "tar",
        formatOptions = Map("members" -> "txt:doc_id"), force = true)
    }
    assert(e3.getMessage.contains("index column"), e3.getMessage)
  }

  test("FORMAT_OPTIONS('members'): stems with ONLY unmapped members " +
      "do not become spurious all-NULL rows; mapped members on a stem " +
      "with unmapped siblings still load") {
    import spark.implicits._
    val root = tempDir("copyinto-tarstray")
    val table = root + "/t"
    val landing = root + "/landing"
    PDataset.fromDataFrame(
      Seq((-1L, "seed", "m")).toDF("doc_id", "text", "meta"),
      Seq("doc_id")).reindex(Seq("doc_id")).writeParquet(table)
    // hand-built shard: sample 7 (mapped members + a stray sidecar),
    // plus README (extensionless) and notes.md (unmapped ext) strays
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(landing))
    val fos = java.nio.file.Files.newOutputStream(
      java.nio.file.Paths.get(landing, "shard-00000.tar"))
    graft.operators.Export.writeMember(fos, "7.txt", "b7".getBytes("UTF-8"))
    graft.operators.Export.writeMember(fos, "7.json", "m7".getBytes("UTF-8"))
    graft.operators.Export.writeMember(fos, "7.xyz", "x".getBytes("UTF-8"))
    graft.operators.Export.writeMember(fos, "README", "hi".getBytes("UTF-8"))
    graft.operators.Export.writeMember(fos, "notes.md", "n".getBytes("UTF-8"))
    fos.write(new Array[Byte](1024))
    fos.close()

    val r = CopyInto.copyInto(spark, table, landing, "tar",
      formatOptions = Map("members" -> "txt:text, json:meta"))
    assert(r.filesLoaded == 1 && r.rowsLoaded == 1,
      s"strays must not load: $r")
    val got = spark.read.format("graft").load(table)
      .as[(Long, String, String)].collect().toSet
    assert(got == Set((-1L, "seed", "m"), (7L, "b7", "m7")), got.toString)
  }

  test("FILEFORMAT = JSONL: gzip'd lines load once with field " +
      "mapping; JSON null is a value, blank lines skip") {
    import spark.implicits._
    val root = tempDir("copyinto-jsonl")
    val table = root + "/t"
    val landing = root + "/landing"
    PDataset.fromDataFrame(
      Seq((-1L, "seed", "en")).toDF("doc_id", "text", "lang"),
      Seq("doc_id")).reindex(Seq("doc_id")).writeParquet(table)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(landing))
    def landGz(name: String, lines: Seq[String]): Unit = {
      val os = new java.util.zip.GZIPOutputStream(
        java.nio.file.Files.newOutputStream(
          java.nio.file.Paths.get(landing, name)))
      os.write(lines.mkString("\n").getBytes("UTF-8"))
      os.close()
    }
    landGz("a.jsonl.gz", Seq(
      """{"id": 1, "body": "one", "language": "en", "extra": 9}""",
      "", // blank line skips
      """{"id": 2, "body": "two", "language": null}""")) // null = value
    val opts = Map("fields" -> "id:doc_id,body:text,language:lang")
    val r1 = CopyInto.copyInto(spark, table, landing, "jsonl",
      formatOptions = opts)
    assert(r1.filesLoaded == 1 && r1.rowsLoaded == 2, r1.toString)
    // exactly-once: the re-run loads nothing
    val r2 = CopyInto.copyInto(spark, table, landing, "jsonl",
      formatOptions = opts)
    assert(r2.filesLoaded == 0 && r2.filesSkipped == 1, r2.toString)
    val got = spark.read.format("graft").load(table)
      .as[(Long, String, Option[String])].collect().toSet
    assert(got == Set((-1L, "seed", Some("en")), (1L, "one", Some("en")),
      (2L, "two", None)), got.toString)
  }

  test("FILEFORMAT = JSONL refuses loudly on a malformed line and on " +
      "an absent mapped field") {
    import spark.implicits._
    def mk(tag: String): (String, String) = {
      val root = tempDir(s"copyinto-jsonl-$tag")
      val table = root + "/t"
      val landing = root + "/landing"
      PDataset.fromDataFrame(
        Seq((-1L, "seed", "en")).toDF("doc_id", "text", "lang"),
        Seq("doc_id")).reindex(Seq("doc_id")).writeParquet(table)
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(landing))
      (table, landing)
    }
    val opts = Map("fields" -> "id:doc_id,body:text,language:lang")
    def rootMsgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ rootMsgs(t.getCause)

    // not JSON at all — Spark's own reader would silently NULL it
    val (t1, l1) = mk("bad")
    java.nio.file.Files.write(java.nio.file.Paths.get(l1, "bad.jsonl"),
      "{\"id\": 1, \"body\": \"ok\", \"language\": \"en\"}\nnot json\n"
        .getBytes("UTF-8"))
    val e1 = intercept[Exception](
      CopyInto.copyInto(spark, t1, l1, "jsonl", formatOptions = opts))
    assert(rootMsgs(e1).exists(m => m.contains("malformed JSON line") &&
      m.contains("bad.jsonl")), rootMsgs(e1).mkString(" | "))

    // a mapped field ABSENT from the line (schema drift), unlike an
    // explicit null
    val (t2, l2) = mk("miss")
    java.nio.file.Files.write(java.nio.file.Paths.get(l2, "m.jsonl"),
      "{\"id\": 1, \"body\": \"no language key\"}\n".getBytes("UTF-8"))
    val e2 = intercept[Exception](
      CopyInto.copyInto(spark, t2, l2, "jsonl", formatOptions = opts))
    assert(rootMsgs(e2).exists(m => m.contains("'language' missing") &&
      m.contains("m.jsonl")), rootMsgs(e2).mkString(" | "))

    // a mapping naming a column the table lacks refuses up front
    val (t3, l3) = mk("col")
    java.nio.file.Files.write(java.nio.file.Paths.get(l3, "x.jsonl"),
      "{\"id\": 1}\n".getBytes("UTF-8"))
    val e3 = intercept[Exception](CopyInto.copyInto(spark, t3, l3, "jsonl",
      formatOptions = Map("fields" -> "id:doc_id,body:nope")))
    assert(rootMsgs(e3).exists(_.contains("`nope`")),
      rootMsgs(e3).mkString(" | "))
  }

  test("CONVERT TO GRAFT adopts a bare parquet directory in place; " +
      "re-converting is a no-op; COPY INTO then applies") {
    val root = tempDir("convert")
    val bare = root + "/bare"
    keyedDF(0, 100).repartition(2).write.parquet(bare)
    assert(!Sidecar.exists(spark, bare))

    val row = spark.sql(
      s"CONVERT TO GRAFT '$bare' INDEX (k)").head()
    assert(row.getLong(1) == 100L && !row.getBoolean(2), row.toString)
    assert(Sidecar.load(spark, bare).indexColumns == Seq("k"))
    // a second CONVERT is a no-op report, not a re-stat
    val again = spark.sql(
      s"CONVERT TO GRAFT '$bare' INDEX (k)").head()
    assert(again.getBoolean(2) && again.getLong(1) == 100L)

    // the converted table is a full citizen: COPY INTO ingests
    val landing = root + "/landing"
    Files.createDirectories(Paths.get(landing))
    land(landing, "a.parquet", keyedDF(100, 10))
    val r = CopyInto.copyInto(spark, bare, landing, "parquet")
    assert(r.filesLoaded == 1)
    assert(PDataset.scanParquet(spark, bare).toDF.count() == 110)
    // DESCRIBE DETAIL surfaces the ledger
    val det = spark.sql(s"DESCRIBE DETAIL graft.`$bare`").head()
    assert(det.getAs[Int]("copy_ledger_entries") == 1, det.toString)
  }

  test("COPY INTO a non-table target refuses; ledger survives " +
      "unrelated maintenance commits") {
    val root = tempDir("copyinto-guards")
    val table = root + "/t"
    val landing = root + "/landing"
    Files.createDirectories(Paths.get(landing))
    intercept[Exception] {
      CopyInto.copyInto(spark, root + "/nope", landing, "parquet")
    }
    mkTable(table)
    land(landing, "a.parquet", keyedDF(100, 20))
    assert(CopyInto.copyInto(spark, table, landing, "parquet")
      .filesLoaded == 1)
    // a compact rewrites the sidecar — the ledger must ride along
    graft.operators.Maintenance.compact(spark, table, targetRows = 1000)
    val r = CopyInto.copyInto(spark, table, landing, "parquet")
    assert(r.filesSkipped == 1 && r.filesLoaded == 0, r.toString)
    assert(Sidecar.load(spark, table).copyLedger.size == 1)
  }
}
