package graft.examples

import org.apache.spark.sql.SparkSession

/** Quantifies the per-query PLAN-TIME constant the graft extension
  * stack adds — the "is a uniform bench drift environmental or ours?"
  * separator. Every graft session carries ~10 injected hooks (4
  * division rewrites, 2 scan substitutions, row-level rewrite, parser,
  * TVFs, function registry); if those cost a per-query constant, it
  * shows up here as `ext - bare` on queries the rules never rewrite,
  * multiplied by 167 queries in the round bench.
  *
  * Method: the SAME SparkContext hosts two sessions — the graft
  * session (full extension stack) and a bare `new
  * classic.SparkSession(sc)` (fresh, extension-free state) — and each
  * query is taken through analysis + optimization + physical planning
  * (`queryExecution.executedPlan`, no execution) `reps` times on a
  * fresh DataFrame; the table reports the per-query MIN and MEDIAN of
  * each side in milliseconds.
  *
  * Measured (sf0.01, local[32], reps=50): see README §benchmarks —
  * the stack's plan-time delta is single-digit milliseconds per
  * query, two orders below the ~100-300 ms/query constant that a
  * 1.28× drift over 167 queries would require.
  *
  * Usage: sbt "runMain graft.examples.ExtensionOverhead [reps]"
  *        (SPARK_GRAFT_SF_DIR selects the data, default sf0.01)
  */
object ExtensionOverhead {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(50)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val ext = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    ext.sparkContext.setLogLevel("WARN")
    val bare: SparkSession =
      org.apache.spark.sql.GraftBridge.bareSession(ext.sparkContext)

    def prep(s: SparkSession): Unit = {
      s.read.parquet(s"$sfDir/documents.parquet")
        .createOrReplaceTempView("documents")
      s.read.parquet(s"$sfDir/orders.parquet")
        .createOrReplaceTempView("orders")
    }
    prep(ext); prep(bare)

    // deliberately rule-INELIGIBLE queries: plain parquet reads, so
    // every injected rule walks the tree, matches nothing, and what
    // remains is exactly the constant under test
    val queries = Seq(
      "select1" -> "SELECT 1 AS one",
      "filter" -> ("SELECT doc_id, n_chars FROM documents " +
        "WHERE n_chars > 100"),
      "agg" -> ("SELECT source, count(*) AS n, sum(n_chars) AS c " +
        "FROM documents GROUP BY source"),
      "join_agg" -> ("SELECT d.lang, count(*) AS n FROM documents d " +
        "JOIN orders o ON d.doc_id = o.o_orderkey GROUP BY d.lang"),
      "window" -> ("SELECT max(rk) FROM (SELECT row_number() OVER " +
        "(PARTITION BY lang ORDER BY n_chars) AS rk FROM documents)"))

    def planMs(s: SparkSession, q: String): Seq[Double] =
      (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        s.sql(q).queryExecution.executedPlan
        (System.nanoTime() - t0) / 1e6
      }

    println(f"${"query"}%-9s ${"ext_min"}%8s ${"ext_med"}%8s " +
      f"${"bare_min"}%9s ${"bare_med"}%9s ${"d_min"}%7s (ms/query)")
    queries.foreach { case (name, q) =>
      planMs(ext, q); planMs(bare, q) // warm both paths (JIT, caches)
      val e = planMs(ext, q).sorted
      val b = planMs(bare, q).sorted
      println(f"$name%-9s ${e.head}%8.2f ${e(e.length / 2)}%8.2f " +
        f"${b.head}%9.2f ${b(b.length / 2)}%9.2f " +
        f"${e.head - b.head}%7.2f")
    }
    ext.stop()
  }
}
