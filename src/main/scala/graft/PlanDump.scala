package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Measurement harness (optimization rounds): writes
  * `.explain("formatted")` for each SparkEntry query to
  * `<outDir>/<query>.txt` so plan shapes (Exchange count, join
  * strategy, PushedFilters/ReadSchema, codegen spans) can be diffed
  * before/after a change without re-running the bench. Explaining a
  * query builds its DataFrame, which for the fixture-backed queries
  * also builds (once per process) the same fixtures the bench uses —
  * results are never consumed here. SPARK_GRAFT_ONLY filters, same
  * contract as Verify/Bench. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // Collect EVERY plan executed while a query's body runs (the
    // maintenance/streaming queries run their interesting plans
    // eagerly inside the body; the returned DataFrame is often just
    // the final scan): a QueryExecutionListener appends each
    // successful execution's formatted plan, drained per query.
    val execPlans = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        val txt = try qe.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          catch { case e: Throwable => s"<explain failed: ${e.getMessage}>" }
        execPlans.add(f"==== action: $funcName (${durationNs / 1e9}%.3f s) ====\n$txt")
        ()
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val execMode = sys.env.get("SPARK_GRAFT_PLANDUMP_EXEC").contains("1")
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try {
          execPlans.clear()
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/$name.txt"), txt)
          if (execMode) {
            org.apache.spark.sql.GraftListenerFlush.drain(spark)
            val all = new StringBuilder
            execPlans.forEach(p => { all.append(p).append('\n'); () })
            Files.writeString(Paths.get(s"$outDir/${name}_exec.txt"),
              all.toString)
          }
        } catch {
          case e: Throwable =>
            System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
