package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one non-public door the library needs: construct a DataFrame from
  * a custom LogicalPlan (`classic.Dataset.ofRows` — the same entry every
  * Spark extension library bridges through; there is no public
  * equivalent). Nothing else in the repo lives outside the `graft`
  * namespace, and nothing else reaches internal API.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
