package org.apache.spark.sql

/** Test access to `sql`-private session internals. */
object GraftSqlTestBridge {

  /** `cloneSession` is what structured streaming uses to derive its
    * micro-batch session; tests use it to prove the injected rules
    * gate on the CLONE's conf (thread-local SQLConf), not on the
    * parent session captured at construction. */
  def cloneSession(s: SparkSession): SparkSession =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .cloneSession()
}
