package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge into the `org.apache.spark.sql` package-private Dataset
  * construction (Spark 4.x classic API), so graft's custom logical
  * plans (`graft.plans.AsofJoin`) can surface as ordinary DataFrames.
  * Same pattern — and same justification — as `ColumnBridge`
  * (cf. /root/repo/SNIPPETS.md [3], a public DatasetFactory bridge in
  * `org.apache.spark.sql`).
  */
object DatasetBridge {
  def ofRows(s: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], plan)
}
