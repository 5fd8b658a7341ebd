package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** The one `private[sql]` door graft needs: turning a hand-built
  * [[LogicalPlan]] into a DataFrame. `Dataset.ofRows` is the entry
  * point every Spark extension library uses for this (there is no
  * public equivalent), so this object lives under the
  * `org.apache.spark.sql` package tree — the standard pattern for
  * Spark-native plan extensions. Nothing else from Spark internals
  * is re-exported here.
  */
object GraftShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)
}
