package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.PDataset

/** Measures the zero-Exchange division rewrites (SqlDivisionAgg /
  * SqlDivisionWindow / SqlDivisionSort) against Spark's shuffle plans
  * — BOTH sides of the trade the `spark.graft.sql.divisionMinBytes`
  * cost floor encodes. Grounds the README numbers.
  *
  * What it shows (4M rows, 64 files, local[32]):
  *   - the rewrite eliminates ALL shuffle bytes (off_shuf vs on_shuf
  *     columns — e.g. 188 MB -> 0 for the GROUP BY) and the pruning
  *     audit proves each division branch reads only its own files;
  *   - the rewrite pays a FIXED, data-independent cost of ~90 ms per
  *     branch of serial driver-side whole-stage codegen while the
  *     union RDD is built (each branch's range literals are a
  *     distinct codegen unit): on_exec stays ~6 s at g=64 whether the
  *     table has 400 k or 4 M rows, while off_exec scales with data.
  *
  * The crossover is where shuffle cost beats g×90 ms. A single-box
  * memory-speed shuffle needs tens of GB to lose; a cluster fabric
  * loses far sooner; at the 100 TB design point (g capped at 256 →
  * ~23 s of driver work vs hours of Exchange) the rewrite always
  * wins — which is why the floor defaults to 1 GiB instead of trying
  * to win benchmarks this size.
  *
  * Round 16: branch range bounds became codegen REFERENCES
  * (DivisionBoundValue) and graft sessions drop the stage-id class
  * name cosmetic, so every branch generates byte-identical source and
  * the source-keyed compile cache JIT-compiles ONE unit per stage
  * shape for ANY g (compiles=0 in the audit after warmup). The
  * remaining per-branch fixed cost, measured by the audit below, is
  * ~16-20 ms of driver-side scan SETUP — dominated by Spark's
  * per-FileSourceScanExec work (a fresh Hadoop conf + broadcast per
  * scan), with ~4 ms of codegen source GENERATION (wholeStage=false
  * removes only that slice). So cost is linear in g with a small
  * constant, not flat: g=1024 ≈ 20 s of driver time. The byte target
  * (spark.graft.division.targetBytes, 2 GiB) means g=1024 implies a
  * ≥2 TB table, where 20 s displaces a multi-TB Exchange; the hard
  * cap (spark.graft.division.hardMaxDivisions, 4096) bounds the
  * worst case at ~80 s against hours of shuffle at 100 TB. True
  * flatness needs a single physical scan node with per-partition
  * bounds — the next step if driver time ever dominates.
  *
  * Usage: sbt "runMain graft.examples.DivisionSqlBench [rows] [reps] [files]"
  */
object DivisionSqlBench {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(4000000L)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val filesArg = args.lift(2).map(_.toInt)
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the fixture is sized for measurement, not the production floor
    spark.conf.set("spark.graft.sql.divisionMinBytes", "0")

    val dir = java.nio.file.Files.createTempDirectory("divsql")
      .resolve("t").toString
    val files = filesArg.getOrElse(64)
    val per = rows / files
    val parts = (0 until files).map { i =>
      PDataset.fromDataFrame(
        spark.range(i * per, (i + 1) * per).select(
          (col("id") / 4).as("k"),
          col("id").as("v"),
          sha1(col("id").cast("string")).as("pay1"),
          (col("id") % 99991).as("pay2")), Seq("k"))
    }
    PDataset.concat(parts).writeParquet(dir)
    spark.read.format("graft").load(dir).createOrReplaceTempView("t")

    // a second table co-clustered on k (unique keys, same domain) for
    // the division-join family; joins must clear the broadcast gate
    val dirU = java.nio.file.Files.createTempDirectory("divsql")
      .resolve("u").toString
    val uRows = rows / 4
    val uFiles = math.max(1, files / 4)
    val uPer = uRows / uFiles
    PDataset.concat((0 until uFiles).map { i =>
      PDataset.fromDataFrame(
        spark.range(i * uPer, (i + 1) * uPer).select(
          // SAME TYPE as t.k (double): the rewrite requires the ON
          // clause to pair bare attributes — a type mismatch inserts
          // a cast and keeps Spark's plan
          col("id").cast("double").as("k"),
          (col("id") % 7).as("w"),
          md5(col("id").cast("string")).as("pay3")), Seq("k"))
    }).writeParquet(dirU)
    spark.read.format("graft").load(dirU).createOrReplaceTempView("u")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val shuffled = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            shuffled.addAndGet(
              e.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })

    val queries = Seq(
      "agg" -> ("SELECT k, count(*) AS n, sum(v) AS sv, " +
        "max(pay1) AS mp FROM t GROUP BY k"),
      "window" -> ("SELECT max(rk) AS m FROM (SELECT row_number() " +
        "OVER (PARTITION BY k ORDER BY v DESC) AS rk FROM t)"),
      "sort" -> "SELECT k, v, pay2 FROM t ORDER BY k, v",
      "sort_limit" -> "SELECT k, v FROM t ORDER BY k, v LIMIT 100",
      // the division-join family: the plain join kills BOTH side
      // shuffles; join_agg composes through the node's declared range
      // partitioning (join + GROUP BY key, Exchange-free end to end);
      // anti is the decontamination shape (left-only output, right
      // scans narrowed to the key column, keys-only builds)
      "join" -> "SELECT t.k, t.v, u.w FROM t JOIN u ON t.k = u.k",
      "join_agg" -> ("SELECT t.k, count(*) AS n, sum(u.w) AS sw " +
        "FROM t JOIN u ON t.k = u.k GROUP BY t.k"),
      "anti" -> ("SELECT k, v FROM t WHERE NOT EXISTS " +
        "(SELECT 1 FROM u WHERE u.k = t.k)"))

    def run(q: String): (Double, Double, Long) = {
      shuffled.set(0L)
      val t0 = System.nanoTime()
      val df = spark.sql(q)
      df.queryExecution.executedPlan // force analysis+optimization+planning
      val t1 = System.nanoTime()
      df.foreach(_ => ()) // execute without driver materialization
      Thread.sleep(200) // let the listener drain task-end events
      ((t1 - t0) / 1e9, (System.nanoTime() - t1) / 1e9, shuffled.get())
    }

    // pruning audit: every division branch must read ONLY its own
    // files — the summed numFiles across scans should be ~the file
    // count (+straddlers), not branches × files
    locally {
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      val df = spark.sql(queries.head._2)
      df.foreach(_ => ())
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val scans = plan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      val numFiles = scans.map(f =>
        f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
          .map(_.files.length).sum).sum
      println(s"pruning audit: ${scans.length} scans read " +
        s"$numFiles files total (table has $files)")
    }

    println(f"${"query"}%-11s ${"off_plan"}%8s ${"off_exec"}%8s " +
      f"${"on_plan"}%8s ${"on_exec"}%8s ${"off_shuf"}%9s ${"on_shuf"}%8s")
    queries.foreach { case (name, q) =>
      def best(on: Boolean): (Double, Double, Long) = {
        Seq("divisionAgg", "divisionWindow", "divisionSort",
          "divisionJoin").foreach(c =>
          spark.conf.set(s"spark.graft.sql.$c", on.toString))
        (0 until reps).map(_ => run(q)).minBy(t => t._1 + t._2)
      }
      val (offP, offE, offB) = best(on = false)
      val (onP, onE, onB) = best(on = true)
      println(f"$name%-11s $offP%8.2f $offE%8.2f $onP%8.2f $onE%8.2f " +
        f"${offB / 1048576}%7dMB ${onB / 1048576}%6dMB")
    }
    // Codegen amortization audit: fixed driver cost vs branch count.
    // shared=true is graft's default (reference bounds + stable class
    // names → one compile, flat in g); shared=false restores Spark's
    // stage-id class names (every branch compiles, and past ~50
    // branches the 100-entry codegen cache thrashes → cost every run).
    println(f"%namortization (agg query, min of $reps reps):")
    Seq(16, 64, 256, files).distinct.filter(_ <= files).foreach { g =>
      spark.conf.set("spark.graft.division.maxDivisions", g.toString)
      val m = org.apache.spark.metrics.source.CodegenMetrics
      val c0 = m.METRIC_COMPILATION_TIME.getCount
      val r = (0 until reps).map(_ => run(queries.head._2))
      val compiles = m.METRIC_COMPILATION_TIME.getCount - c0
      val (p, e, _) = r.minBy(t => t._1 + t._2)
      val (fp, fe, _) = r.head
      println(f"  g=$g%-5d plan=$p%6.2f exec=$e%6.2f" +
        f" first_plan=$fp%6.2f first_exec=$fe%6.2f compiles=$compiles")
    }
    spark.conf.unset("spark.graft.division.maxDivisions")
    spark.conf.set("spark.sql.codegen.useIdInClassName", "false")
    spark.stop()
  }
}
