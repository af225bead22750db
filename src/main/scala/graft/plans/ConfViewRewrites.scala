package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Plain-SQL surface for the incremental-view stack: the session conf
  * `spark.graft.views` (comma-separated view directories) routes
  * matching SQL aggregates through [[ViewRewrite]] with no Scala
  * registration call:
  *
  * {{{
  *   CREATE TEMPORARY VIEW orders USING graft
  *     OPTIONS (path '/data/orders');
  *   SET spark.graft.views=/data/orders_by_cust_view;
  *   SELECT o_custkey, sum(o_qty) FROM orders
  *   GROUP BY o_custkey;   -- answered from the view when fresh
  * }}}
  *
  * Installed (idempotently) whenever a graft relation is created —
  * the same hook that installs [[MetadataCount]] — so the conf works
  * in any session that scans a graft dataset, including `spark-sql`
  * sessions that never touch the Scala API. The conf is re-read on
  * every plan, so `SET` / `RESET` take effect immediately; each
  * directory keeps one cached [[ViewRewrite]] delegate (its
  * fingerprint caches make steady-state freshness checks two driver
  * stat calls). Every soundness gate lives in the delegate: a stale,
  * missing, or malformed view silently declines — a bad conf entry
  * can slow nothing down and can never change results. */
class ConfViewRewrites(spark: SparkSession) extends Rule[LogicalPlan] {

  private val delegates =
    scala.collection.mutable.HashMap.empty[String, ViewRewrite]

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val conf =
      try spark.conf.get(ConfViewRewrites.Key, "")
      catch { case scala.util.control.NonFatal(_) => "" }
    if (conf == null || conf.trim.isEmpty) return plan
    val dirs = conf.split(",").map(_.trim).filter(_.nonEmpty).distinct
    synchronized {
      // Conf edits drop removed delegates so a long-lived session
      // never pins caches for views it no longer routes through.
      delegates.keys.filterNot(dirs.contains).toList
        .foreach(delegates.remove)
    }
    dirs.foldLeft(plan) { (p, dir) =>
      val d = synchronized(
        delegates.getOrElseUpdate(dir, new ViewRewrite(spark, dir)))
      d.apply(p)
    }
  }
}

object ConfViewRewrites {

  /** Comma-separated view directories; runtime-settable (`SET`). */
  val Key = "spark.graft.views"

  /** Install on the session's optimizer (idempotent). */
  def ensure(spark: SparkSession): Unit = {
    import org.apache.spark.sql.classic
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    exp.synchronized {
      if (!exp.extraOptimizations.exists(_.isInstanceOf[ConfViewRewrites]))
        exp.extraOptimizations ++= Seq(new ConfViewRewrites(spark))
    }
  }
}
