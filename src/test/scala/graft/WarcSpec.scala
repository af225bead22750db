package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.PDataset
import graft.operators.{CopyInto, Warc}

/** WARC/WET ingestion + export: record framing conformance, gzip,
  * loud refusals, deterministic shard export, COPY INTO FILEFORMAT =
  * WARC exactly-once. */
class WarcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def record(
      uri: String, body: String, extra: String = ""): Array[Byte] = {
    val b = body.getBytes("UTF-8")
    (s"WARC/1.0\r\nWARC-Type: conversion\r\n" +
      s"WARC-Target-URI: $uri\r\n" + extra +
      s"Content-Length: ${b.length}\r\n\r\n").getBytes("UTF-8") ++
      b ++ "\r\n\r\n".getBytes("UTF-8")
  }

  private def parse(bytes: Array[Byte]) =
    Warc.parseWarcStream(new java.io.ByteArrayInputStream(bytes), "t")
      .toSeq

  test("record framing: CRLF headers, exact Content-Length body, " +
      "blank padding between records, obsolete header folding") {
    val two = record("http://a/1", "hello world") ++
      "\r\n\r\n".getBytes("UTF-8") ++ // extra padding tolerated
      record("http://a/2", "second\r\nwith\r\nlines",
        extra = "WARC-Block-Digest: sha1:\r\n abcdef\r\n")
    val rs = parse(two)
    assert(rs.map(_.targetUri) == Seq("http://a/1", "http://a/2"))
    assert(new String(rs(0).body, "UTF-8") == "hello world")
    assert(new String(rs(1).body, "UTF-8") == "second\r\nwith\r\nlines")
    // folded continuation joined onto the previous header
    assert(rs(1).headers("warc-block-digest") == "sha1: abcdef")
    assert(rs.forall(_.warcType == "conversion"))
  }

  test("malformed archives refuse loudly: bad version line, missing " +
      "Content-Length, truncated body") {
    val bad1 = "HTTP/1.1 200 OK\r\n\r\n".getBytes("UTF-8")
    val e1 = intercept[IllegalArgumentException](parse(bad1))
    assert(e1.getMessage.contains("version line"), e1.getMessage)

    val bad2 = ("WARC/1.0\r\nWARC-Type: conversion\r\n\r\n")
      .getBytes("UTF-8")
    val e2 = intercept[IllegalArgumentException](parse(bad2))
    assert(e2.getMessage.contains("Content-Length"), e2.getMessage)

    val bad3 = ("WARC/1.0\r\nContent-Length: 100\r\n\r\nshort")
      .getBytes("UTF-8")
    val e3 = intercept[IllegalArgumentException](parse(bad3))
    assert(e3.getMessage.contains("truncated"), e3.getMessage)
  }

  test("gzip'd archives inflate transparently, including the " +
      "CommonCrawl one-member-per-record concatenated layout") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close()
      bos.toByteArray
    }
    // two separate gzip members, concatenated
    val bytes = gz(record("http://g/1", "one")) ++
      gz(record("http://g/2", "two"))
    val dir = Fixtures.tempDir("warc-gz")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "f.warc.gz"), bytes)
    val got = Warc.warcRecords(spark, Seq(dir + "/f.warc.gz"))
      .collect().map(r => (r._3, new String(r._4, "UTF-8"))).sorted
    assert(got.toSeq == Seq(("http://g/1", "one"), ("http://g/2", "two")))
  }

  test("concatenated gzip members all inflate even when the " +
      "underlying stream reports available() == 0") {
    // GZIPInputStream only attempts the next member when
    // available() > 0 — object-store FS streams commonly report 0,
    // silently dropping every member after the first. The explicit
    // member loop must read them all.
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close()
      bos.toByteArray
    }
    val n = 50
    val bytes = (1 to n).map(i =>
      gz(record(s"http://m/$i", s"body-$i" * 200))).reduce(_ ++ _)
    val zeroAvail = new java.io.ByteArrayInputStream(bytes) {
      override def available(): Int = 0
    }
    val got = Warc.parseWarcStream(
      new Warc.MultiMemberGzipInputStream(zeroAvail, "t"), "t").toSeq
    assert(got.length == n, s"expected $n records, got ${got.length}")
    assert(got.map(_.targetUri) == (1 to n).map(i => s"http://m/$i"))
    assert(new String(got(n - 1).body, "UTF-8") == s"body-$n" * 200)
  }

  test("multi-member gzip refuses loudly on trailing garbage and on " +
      "a corrupted member body (CRC)") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close()
      bos.toByteArray
    }
    def readAll(bytes: Array[Byte]): Unit = {
      val in = new Warc.MultiMemberGzipInputStream(
        new java.io.ByteArrayInputStream(bytes), "src.gz")
      val buf = new Array[Byte](4096)
      while (in.read(buf) >= 0) ()
    }
    // garbage between members: not silent EOF, a named refusal
    val garbage = gz("first".getBytes("UTF-8")) ++
      "JUNK".getBytes("UTF-8") ++ gz("second".getBytes("UTF-8"))
    val e1 = intercept[IllegalArgumentException](readAll(garbage))
    assert(e1.getMessage.contains("src.gz") &&
      e1.getMessage.contains("gzip member header"), e1.getMessage)
    // flipped byte in the deflate body (or its trailer): refuses, and
    // names the source either way
    val one = gz(("payload" * 100).getBytes("UTF-8"))
    one(one.length - 10) = (one(one.length - 10) ^ 0x55).toByte
    val e2 = intercept[Exception](readAll(one))
    assert(e2.getMessage.contains("src.gz"), e2.getMessage)
  }

  test("writeWetShards/readWetShards roundtrip; re-export is " +
      "byte-identical; stale shards from a prior layout are cleaned") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(concat(lit("http://ex.com/"), col("doc_id")).as("uri"),
        col("text"))
    val dir = Fixtures.tempDir("wet-out") + "/shards"
    val n = Warc.writeWetShards(docs, "uri", "text", dir, 4, "s1")
    assert(n == 4)
    val back = Warc.readWetShards(spark, dir)
    Fixtures.assertSameRows(
      back.select("uri", "text"), docs.select("uri", "text"))
    // warcinfo records are skipped, shards carry their ordinal
    assert(back.select("shard").distinct().count() == 4)

    // byte-identical re-export (epoch dates, md5 record ids)
    def bytesOf(): Map[String, Seq[Byte]] =
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".warc.wet"))
        .map(f => f.getName ->
          java.nio.file.Files.readAllBytes(f.toPath).toSeq).toMap
    val first = bytesOf()
    Warc.writeWetShards(docs, "uri", "text", dir, 4, "s1")
    assert(bytesOf() == first, "re-export must be byte-identical")

    // a 1-shard re-export removes the stale 4-shard layout
    Warc.writeWetShards(docs, "uri", "text", dir, 1, "s1")
    val left = new java.io.File(dir).listFiles()
      .map(_.getName).filterNot(_.startsWith(".")).sorted
    assert(left.toSeq == Seq("shard-00000.warc.wet"), left.mkString(","))
    assert(Warc.readWetShards(spark, dir).count() == docs.count())

    // NULL URIs refuse loudly
    val e = intercept[Exception] {
      Warc.writeWetShards(
        Seq((null: String, "x")).toDF("uri", "text"),
        "uri", "text", Fixtures.tempDir("wet-null") + "/s", 1, "s")
    }
    assert(e.getMessage != null && e.getMessage.contains("NULL"),
      s"${e.getClass}: ${e.getMessage}")
  }

  test("compress = true writes gzip'd WET shards that roundtrip " +
      "through the magic-sniffing reader and COPY INTO, " +
      "byte-identically on re-export") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(concat(lit("http://gz.com/"), col("doc_id")).as("uri"),
        col("text"))
    val dir = Fixtures.tempDir("wet-gz") + "/shards"
    val n = Warc.writeWetShards(docs, "uri", "text", dir, 3, "s1",
      compress = true)
    assert(n == 3)
    val files = new java.io.File(dir).listFiles()
      .map(_.getName).filterNot(_.startsWith(".")).sorted
    assert(files.forall(_.endsWith(".warc.wet.gz")), files.mkString(","))
    Fixtures.assertSameRows(
      Warc.readWetShards(spark, dir).select("uri", "text"), docs)
    // deterministic compressed bytes (epoch gzip header)
    def md5s() = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".gz"))
      .map(f => f.getName -> java.util.Arrays.hashCode(
        java.nio.file.Files.readAllBytes(f.toPath))).toMap
    val first = md5s()
    Warc.writeWetShards(docs, "uri", "text", dir, 3, "s1",
      compress = true)
    assert(md5s() == first, "compressed re-export must be byte-identical")
    // a compressed re-export replaces a stale UNcompressed layout
    Warc.writeWetShards(docs, "uri", "text", dir, 2, "s1")
    val left = new java.io.File(dir).listFiles()
      .map(_.getName).filterNot(_.startsWith(".")).sorted
    assert(left.forall(_.endsWith(".warc.wet")) && left.length == 2,
      left.mkString(","))
  }

  test("COPY INTO FILEFORMAT = WARC: exactly-once ledger, warcinfo " +
      "skip, FORMAT_OPTIONS('types') filter, wide-table refusal") {
    val root = Fixtures.tempDir("copy-warc")
    val table = root + "/t"
    val landing = root + "/landing"
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(concat(lit("http://ex.com/"), col("doc_id")).as("uri"),
        col("text"), col("doc_id"))
    PDataset.fromDataFrame(
      docs.filter(col("doc_id") < 50).select("uri", "text"), Seq("uri"))
      .reindex(Seq("uri")).writeParquet(table)
    Warc.writeWetShards(docs.filter(col("doc_id") >= 50),
      "uri", "text", landing, 3, "e1")

    val r1 = CopyInto.copyInto(spark, table, landing, "warc")
    assert(r1.filesLoaded == 3 && r1.rowsLoaded == 450, r1.toString)
    val r2 = CopyInto.copyInto(spark, table, landing, "warc")
    assert(r2.filesLoaded == 0, "re-run must be exactly-once")
    val got = spark.read.format("graft").load(table)
      .as[(String, String)].collect().toMap
    val want = docs.select("uri", "text")
      .as[(String, String)].collect().toMap
    assert(got == want)

    // a types filter that matches nothing loads no rows (the
    // conversion records are excluded; warcinfo has no URI anyway)
    val t2 = root + "/t2"
    PDataset.fromDataFrame(
      docs.filter(col("doc_id") < 50).select("uri", "text"), Seq("uri"))
      .reindex(Seq("uri")).writeParquet(t2)
    val r3 = CopyInto.copyInto(spark, t2, landing, "warc",
      formatOptions = Map("types" -> "response"))
    assert(r3.rowsLoaded == 0, r3.toString)

    // three-column targets need the text column named
    val wide = root + "/wide"
    PDataset.fromDataFrame(
      docs.filter(col("doc_id") < 50)
        .select(col("uri"), col("text"), lit(1L).as("extra")), Seq("uri"))
      .reindex(Seq("uri")).writeParquet(wide)
    val e = intercept[IllegalArgumentException] {
      CopyInto.copyInto(spark, wide, landing, "warc", force = true)
    }
    assert(e.getMessage.contains("text column"), e.getMessage)
  }
}
