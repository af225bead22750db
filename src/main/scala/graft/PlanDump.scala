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
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/$name.txt"), txt)
        } catch {
          case e: Throwable =>
            System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
