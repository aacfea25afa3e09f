package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the one `private[sql]` constructor a third-party operator
  * needs: building a DataFrame from a custom LogicalPlan. Everything
  * else in graft uses public APIs; this is the standard extension-point
  * shim Spark-native libraries ship until SPARK exposes a public
  * Dataset.ofRows.
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
