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
