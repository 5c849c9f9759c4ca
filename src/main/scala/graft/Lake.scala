package graft

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Cluster-scale materialization: bucketed table writes.
  *
  * Locally, Store persists hot mid-DAG tables in memory. On a real cluster
  * at 100 TB the same boundary is a bucketed parquet table: bucketing by the
  * downstream join/aggregation key means consumers join bucket-to-bucket
  * with NO shuffle of the big side (verified by BucketedJoinSpec: the
  * bucketed fact ⋈ fact plan contains no Exchange).
  */
object Lake {

  /** Write `df` as a bucketed, bucket-sorted parquet table registered in the
    * session catalog. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.drop(1): _*)
      .sortBy(keys.head, keys.drop(1): _*)
      .saveAsTable(table)

  /** Materialize the hot mid-DAG facts as bucketed tables, each bucketed by
    * the key its consumers join/aggregate on (the cluster twin of the
    * Store.table persist boundary). */
  def materializeFacts(ctx: Ctx, buckets: Int = 8): Unit = {
    writeBucketed(layers.Ods.ordersItems(ctx), "lake_orders_items",
      buckets, Seq("order_key"))
    writeBucketed(layers.Wh.fctOrders(ctx), "lake_fct_orders",
      buckets, Seq("customer_key"))
    writeBucketed(layers.Wh.fctOrdersItems(ctx), "lake_fct_orders_items",
      buckets, Seq("order_key"))
  }
}
