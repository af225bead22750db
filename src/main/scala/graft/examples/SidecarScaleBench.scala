package graft.examples

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

import graft.core.{ColumnStats, GraftFs, Lex, Sidecar, TypedJson}
import graft.core.Lex.Bound

/** Pins the driver-side sidecar cost at file counts a 100 TB table
  * implies (~1 GB files → ~10^5 entries; pathological small files →
  * 10^6), so the "single JSON document per commit" design has a
  * MEASURED ceiling instead of an assumed one.
  *
  * For each N in the list (default 10^4, 10^5, 10^6), generates a
  * synthetic N-file sidecar (metadata + `_graft_colstats.json` with a
  * summed long column and a string column) and measures, driver-only:
  *
  *   - `Sidecar.write`  — what every commit pays to install metadata
  *   - `Sidecar.load`   — what every read/maintenance op pays to plan
  *   - `ColumnStats.rawForFiles` (first parse; later reads hit the
  *     mtime-keyed LRU)
  *   - the metadata-only aggregate fold (count/min/max/sum over all
  *     N entries — `graft.plans.MetadataCount`'s arithmetic)
  *
  * Usage: sbt "runMain graft.examples.SidecarScaleBench [n1,n2,...]"
  * Results and the resulting cadence guidance live in README
  * ("Sidecar scale ceiling").
  */
object SidecarScaleBench {

  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val counts = args.headOption
      .map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(10000, 100000, 1000000))
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      // the bench MEASURES costs past the enforced ceiling
      .config(Sidecar.MaxSidecarFilesConf, Int.MaxValue.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files
      .createTempDirectory("sidecar-scale").toString

    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", LongType, nullable = true),
      StructField("s", StringType, nullable = true)))

    counts.foreach { n =>
      val dir = s"$root/t$n"
      val (fs, dirPath) = GraftFs.resolve(spark, dir)
      fs.mkdirs(dirPath)
      val files = (0 until n).map(i => Sidecar.partitionFileName(i.toLong))
      val rows = 1000000L // ~1 GB-file row counts
      val sizes = IndexedSeq.fill(n)(rows)
      val lbs: IndexedSeq[Bound] =
        (0 until n).map(i => Vector(Some(i * rows): Option[Any]))
      val ubs: IndexedSeq[Bound] =
        (0 until n).map(i => Vector(Some((i + 1) * rows - 1L): Option[Any]))

      val (_, wSec) = timed(Sidecar.write(spark, dir, Seq("k"), files,
        sizes, lbs, ubs, n.toLong - 1, schema))
      val metaBytes =
        fs.getFileStatus(Sidecar.metadataPath(dir)).getLen

      // colstats: per file, a summed long column and a string column
      val entries = (0 until n).map { i =>
        Map[String, Any]("name" -> files(i), "stats" -> Seq(
          Map[String, Any]("min" -> (i * 10L), "max" -> (i * 10L + 9L),
            "nulls" -> 0L, "sum" -> (rows * 5L + i), "sumx" -> true),
          Map[String, Any]("min" -> f"a$i%09d", "max" -> f"z$i%09d",
            "nulls" -> 3L)))
      }
      val statsFile = new HPath(dirPath, ColumnStats.FileName)
      GraftFs.writeString(fs, statsFile, TypedJson.write(
        scala.collection.immutable.ListMap(
          "v" -> 2L, "cols" -> Seq("v", "s"), "files" -> entries)))
      val statsBytes = fs.getFileStatus(statsFile).getLen

      val (m, lSec) = timed(Sidecar.load(spark, dir))
      val paths = m.files.map(f => new HPath(dirPath, f).toString)
      val (raw, pSec) = timed(ColumnStats.rawForFiles(spark, paths, schema))

      // the MetadataCount fold: count(*) + min/max/sum(v) over all
      // N entries, Lex-compared like the real rule
      val (folded, fSec) = timed {
        val per = raw("v")
        var cnt = 0L; var sm = 0L
        var mn: Option[Any] = None; var mx: Option[Any] = None
        var i = 0
        while (i < per.length) {
          val s = per(i).get
          cnt += m.sizes(i)
          sm += s.sum.get.get
          if (s.min.isDefined &&
              mn.forall(v => Lex.valueCmp(s.min.get, v) < 0)) mn = s.min
          if (s.max.isDefined &&
              mx.forall(v => Lex.valueCmp(s.max.get, v) > 0)) mx = s.max
          i += 1
        }
        (cnt, mn, mx, sm)
      }
      require(folded._1 == n * rows && folded._2.contains(0L))

      println(f"files=$n%8d  meta=${metaBytes / 1e6}%7.1fMB " +
        f"write=$wSec%6.2fs load=$lSec%6.2fs  " +
        f"colstats=${statsBytes / 1e6}%7.1fMB parse=$pSec%6.2fs " +
        f"fold=${fSec * 1000}%7.1fms")
    }
    spark.stop()
  }
}
