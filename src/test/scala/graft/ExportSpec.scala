package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Export, Sampling}
import Fixtures._

/** WebDataset-style tar shard export: USTAR-conformant members in the
  * deterministic shardAssign order, byte-identical re-exports, and a
  * lossless roundtrip through the whole-file reader. */
class ExportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixtureDf = Seq(
    (1L, "plain text"),
    (2L, ""), // empty member
    (3L, "uniçode éø 中文"),
    (4L, "line1\nline2\n"),
    (5L, "x" * 1500) // spans multiple 512-byte blocks
  ).toDF("doc_id", "text")

  test("roundtrip is lossless, member order is shardAssign's, and " +
      "re-exports are byte-identical") {
    val dir = tempDir("export-wds") + "/out"
    val n = Export.writeTarShards(fixtureDf, "doc_id", "text", dir,
      numShards = 2, seed = "s1")
    assert(n >= 1 && n <= 2)

    val back = Export.readTarShards(spark, dir)
    val got = back.select(
      regexp_replace(col("name"), "\\.txt$", "").cast("long"),
      col("text")).as[(Long, String)].collect().toMap
    val want = fixtureDf.as[(Long, String)].collect().toMap
    assert(got == want, s"roundtrip mismatch: $got")

    // members inside each shard stream in shard_pos order
    val assigned = Sampling.shardAssign(
      fixtureDf.select(col("doc_id").cast("string").as("__id"),
        col("text")), "__id", 2, "s1")
      .select(col("shard"), col("shard_pos"), col("__id"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
    val wantOrder = assigned.groupBy(_._1).map { case (s, rs) =>
      s -> rs.sortBy(_._2).map(_._3 + ".txt").toSeq
    }
    val gotOrder = back.select("shard", "name")
      .collect().map(r => (r.getInt(0), r.getString(1)))
      .groupBy(_._1).map { case (s, rs) => s -> rs.map(_._2).toSeq }
    assert(gotOrder == wantOrder, s"member order: $gotOrder")

    // deterministic: a second export writes the SAME bytes
    val dir2 = tempDir("export-wds2") + "/out"
    Export.writeTarShards(fixtureDf, "doc_id", "text", dir2,
      numShards = 2, seed = "s1")
    def md5s(d: String): Map[String, String] = {
      val p = java.nio.file.Paths.get(d)
      java.nio.file.Files.list(p).toArray.map(_.toString).sorted
        .map { f =>
          val b = java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(f))
          java.nio.file.Paths.get(f).getFileName.toString ->
            java.security.MessageDigest.getInstance("MD5").digest(b)
              .map("%02x".format(_)).mkString
        }.toMap
    }
    assert(md5s(dir) == md5s(dir2), "re-export must be byte-identical")
  }

  test("multi-column samples: one member per column per doc, " +
      "reassembled by stem, system-tar-listable") {
    val dir = tempDir("export-multi") + "/out"
    val df = Seq(
      (1L, "alpha", """{"lang":"en"}""", Array[Byte](1, 2, 3)),
      (2L, "beta", null, Array.emptyByteArray),
      (3L, null, """{"lang":"fr"}""", null))
      .toDF("doc_id", "text", "meta", "payload")
    Export.writeTarShards(df, "doc_id",
      Seq("text" -> "txt", "meta" -> "json", "payload" -> "bin"),
      dir, numShards = 1, seed = "s1")

    // per-doc members are adjacent and in cols order
    val names = Export.readTarMembers(spark, dir)
      .select("stem", "ext").collect().map(r => (r.getString(0), r.getString(1)))
    assert(names.grouped(3).forall { g =>
      g.map(_._1).distinct.length == 1 &&
        g.map(_._2).toSeq == Seq("txt", "json", "bin")
    }, names.mkString(", "))

    // stem reassembly: one row per doc, NULLs back as empty members
    val got = Export.readTarSamples(spark, dir, Seq("txt", "json", "bin"))
      .select(col("stem").cast("long").as("doc_id"),
        col("txt").cast("string"), col("json").cast("string"),
        col("bin"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getAs[Array[Byte]](3).toSeq)).sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "alpha", """{"lang":"en"}""", Seq[Byte](1, 2, 3)),
      (2L, "beta", "", Nil),
      (3L, "", """{"lang":"fr"}""", Nil)))

    if (new java.io.File("/usr/bin/tar").exists()) {
      import scala.sys.process._
      val shard = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
        .toArray.map(_.toString).filter(_.endsWith(".tar")).head
      val listed = Seq("/usr/bin/tar", "-tf", shard).!!.trim
        .split("\n").toSeq
      assert(listed.toSet ==
        Set("1.txt", "1.json", "1.bin", "2.txt", "2.json", "2.bin",
          "3.txt", "3.json", "3.bin"), listed.mkString(", "))
    }
  }

  test("a shard that would exceed the reader cap refuses before " +
      "writing anything; a fitting export into the same dir replaces " +
      "stale shards") {
    val dir = tempDir("export-cap") + "/out"
    // ~1.5 KB per doc into one shard with a 2 KB cap: refuses and
    // names the shard
    val e = intercept[IllegalArgumentException] {
      Export.writeTarShards(fixtureDf, "doc_id", Seq("text" -> "txt"),
        dir, numShards = 1, seed = "s1", maxShardBytes = 2048L)
    }
    assert(e.getMessage.contains("shard-00000.tar") &&
      e.getMessage.contains("numShards"), e.getMessage)
    // nothing was written
    val p = java.nio.file.Paths.get(dir)
    assert(!java.nio.file.Files.exists(p) ||
      java.nio.file.Files.list(p).toArray.isEmpty)

    // stale-shard protection: a 4-shard export followed by a 1-shard
    // export into the SAME dir leaves exactly the 1-shard layout
    Export.writeTarShards(fixtureDf, "doc_id", "text", dir, 4, "s1")
    Export.writeTarShards(fixtureDf, "doc_id", "text", dir, 1, "s1")
    // visible files only: dot-prefixed artifacts (the local FS's
    // checksum sidecar) are invisible to Spark and both readers
    val left = java.nio.file.Files.list(p).toArray.map(_.toString)
      .map(f => java.nio.file.Paths.get(f).getFileName.toString)
      .filterNot(_.startsWith(".")).sorted
    assert(left.toSeq == Seq("shard-00000.tar"), left.mkString(", "))
    assert(Export.readTarShards(spark, dir).count() == 5)
  }

  test("null ids refuse loudly instead of NPE") {
    val dir = tempDir("export-nullid") + "/out"
    val df = Seq((java.lang.Long.valueOf(1L), "a"), (null, "b"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      Export.writeTarShards(df, "doc_id", "text", dir, 1, "s1")
    }
    assert(e.getMessage != null && e.getMessage.contains("NULL"),
      s"${e.getClass}: ${e.getMessage}")
  }

  test("parseTar honors GNU long-name and PAX path overrides; a PAX " +
      "global redefining path refuses") {
    val longName = ("d" * 120) + "/file.txt"
    // GNU 'L': a member whose data names the NEXT member
    def special(tf: Char, data: Array[Byte], name: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      Export.writeMember(bos, name, data)
      val b = bos.toByteArray
      b(156) = tf.toByte // rewrite typeflag, then re-checksum
      java.util.Arrays.fill(b, 148, 156, ' '.toByte)
      val sum = b.take(512).foldLeft(0L)((a, x) => a + (x & 0xff))
      System.arraycopy("%06o".format(sum).getBytes("UTF-8"), 0, b, 148, 6)
      b(154) = 0
      b(155) = ' '
      b
    }
    val member = {
      val bos = new java.io.ByteArrayOutputStream()
      Export.writeMember(bos, "truncated.txt", "payload".getBytes("UTF-8"))
      bos.toByteArray
    }
    val gnu = special('L', (longName + "\u0000").getBytes("UTF-8"),
      "././@LongLink") ++ member ++ new Array[Byte](1024)
    assert(Export.parseTar(gnu).map(p =>
      (p._1, new String(p._2, "UTF-8"))) == Seq((longName, "payload")))

    // PAX 'x': "<len> path=<name>\n" record overrides the next member
    val rec = {
      val body = s" path=$longName\n"
      val len = (body.length + 2 + 1).toString // crude fixpoint: 2-3 digits
      val full = len + body
      if (full.length == len.toInt) full
      else (full.length + 1).toString + body
    }
    val pax = special('x', rec.getBytes("UTF-8"), "pax-hdr") ++
      member ++ new Array[Byte](1024)
    assert(Export.parseTar(pax).map(p =>
      (p._1, new String(p._2, "UTF-8"))) == Seq((longName, "payload")))

    // PAX 'size' override: the member frames and truncates by the
    // effective size (the >8 GB escape hatch, exercised small)
    val sizeRec = "10 size=3\n"
    assert(sizeRec.length == 10)
    val paxSize = special('x', sizeRec.getBytes("UTF-8"), "pax-hdr") ++
      member ++ new Array[Byte](1024)
    assert(Export.parseTar(paxSize).map(p =>
      (p._1, new String(p._2, "UTF-8"))) == Seq(("truncated.txt", "pay")))

    // PAX 'g' redefining path: loud refusal, not a wrong key
    val glob = special('g', rec.getBytes("UTF-8"), "pax-global") ++
      member ++ new Array[Byte](1024)
    val e = intercept[IllegalArgumentException](Export.parseTar(glob))
    assert(e.getMessage.contains("global"), e.getMessage)
  }

  test("malformed PAX record with a non-advancing length refuses " +
      "loudly instead of hanging") {
    // "0 path=x\n" parses len=0: the old loop never advanced p.
    // "1 "/"2 " are positive but shorter than the record's own
    // "N " prefix + newline: they must hit the SAME named refusal,
    // not a StringIndexOutOfBoundsException from a negative substring
    for (bad <- Seq("0 path=x\n", "1 path=x\n", "2 path=x\n",
        "999 path=x\n")) {
      val hdr = {
        val bos = new java.io.ByteArrayOutputStream()
        Export.writeMember(bos, "pax-hdr", bad.getBytes("UTF-8"))
        val b = bos.toByteArray
        b(156) = 'x'.toByte
        java.util.Arrays.fill(b, 148, 156, ' '.toByte)
        val sum = b.take(512).foldLeft(0L)((a, x) => a + (x & 0xff))
        System.arraycopy("%06o".format(sum).getBytes("UTF-8"), 0, b, 148, 6)
        b(154) = 0
        b(155) = ' '
        b
      }
      val member = {
        val bos = new java.io.ByteArrayOutputStream()
        Export.writeMember(bos, "a.txt", "x".getBytes("UTF-8"))
        bos.toByteArray
      }
      val e = intercept[IllegalArgumentException](
        Export.parseTar(hdr ++ member ++ new Array[Byte](1024)))
      assert(e.getMessage.contains("PAX"), s"'$bad' -> ${e.getMessage}")
    }
  }

  test("closeOnExhaust closes the stream when the member iterator " +
      "drains, and only once") {
    var closes = 0
    val in = new java.io.Closeable { def close(): Unit = closes += 1 }
    val it = Export.closeOnExhaust(Iterator(1, 2, 3), in)
    assert(it.next() == 1 && closes == 0)
    assert(it.toList == List(2, 3))
    assert(closes == 1, "closed exactly when exhausted")
    assert(!it.hasNext && closes == 1, "idempotent on re-check")
  }

  test("members are USTAR-conformant (magic, checksum, padding)") {
    val bos = new java.io.ByteArrayOutputStream()
    Export.writeMember(bos, "42.txt", "hello tar".getBytes("UTF-8"))
    val b = bos.toByteArray
    assert(b.length == 1024, "header block + one padded data block")
    assert(new String(b, 257, 5, "UTF-8") == "ustar")
    // checksum: sum of header bytes with the checksum field as spaces
    val h = java.util.Arrays.copyOf(b, 512)
    val stored = java.lang.Long.parseLong(
      new String(h, 148, 6, "UTF-8"), 8)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    val computed = h.foldLeft(0L)((a, x) => a + (x & 0xff))
    assert(stored == computed, s"checksum $stored != $computed")
    // the parser reads its own output
    val parsed = Export.parseTar(b ++ new Array[Byte](1024))
    assert(parsed.map(p => (p._1, new String(p._2, "UTF-8"))) ==
      Seq(("42.txt", "hello tar")))

    // external conformance: the system tar binary (when present)
    // lists our archive — we really write USTAR, not a dialect
    if (new java.io.File("/usr/bin/tar").exists()) {
      val f = java.nio.file.Files.createTempFile("graft-tarconf", ".tar")
      val fos = java.nio.file.Files.newOutputStream(f)
      Export.writeMember(fos, "7.txt", "conform".getBytes("UTF-8"))
      fos.write(new Array[Byte](1024))
      fos.close()
      import scala.sys.process._
      val listed = Seq("/usr/bin/tar", "-tf", f.toString).!!.trim
      assert(listed == "7.txt", s"system tar saw: $listed")
    }

    // over-long names refuse loudly
    val e = intercept[IllegalArgumentException] {
      Export.writeMember(new java.io.ByteArrayOutputStream(),
        "x" * 101 + ".txt", Array.emptyByteArray)
    }
    assert(e.getMessage.contains("100"), e.getMessage)
  }
}
