package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch re-expression of the reference's mutation surface
  * (AddDocument upsert / UpdateDocument / RemoveDocument,
  * collection.go:427-523). On Spark, mutations are merge operations:
  * the collection is a versioned log and the current view is
  * "latest version per key, minus tombstones".
  *
  * Scale posture: one shuffle on the key for the row_number window;
  * with a bucketed/partitioned base table the shuffle is avoided for
  * the big side. Tombstone anti-joins broadcast when small.
  */
object Crud {

  /** Latest-version-wins merge of a base table and a change set.
    * Both inputs must share the schema plus `versionCol`. */
  def upsert(base: DataFrame, changes: DataFrame, keyCol: String,
             versionCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(versionCol).desc)
    base.unionByName(changes)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Remove rows whose key appears in `tombstones` (RemoveDocument). */
  def delete(data: DataFrame, tombstones: DataFrame, keyCol: String): DataFrame =
    data.join(broadcast(tombstones.select(col(keyCol)).distinct()),
      Seq(keyCol), "left_anti")

  /** Current view of a versioned collection log. */
  def currentView(log: DataFrame, keyCol: String, versionCol: String,
                  deletedCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(versionCol).desc)
    log.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && !col(deletedCol))
      .drop("_rn")
  }
}
