package org.apache.spark.sql

/** Measurement-harness helper: QueryExecutionListener callbacks ride
  * the async listener bus, so a plan dump must drain the bus before
  * reading what the listener collected. `listenerBus` is
  * private[spark]; this accessor lives in the spark package tree for
  * that reason only (the GraftFileIndex pattern). */
object GraftListenerFlush {
  def drain(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
