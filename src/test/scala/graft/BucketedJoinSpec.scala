package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Proves the cluster-scale materialization story: facts bucketed on the
  * join key join WITHOUT a shuffle (no ShuffleExchange in the physical
  * plan), while the same join over unbucketed frames needs two. */
class BucketedJoinSpec extends SparkSpec {

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    if (loc.exists()) rm(loc)
  }

  test("bucketed fact-fact join has no shuffle exchange") {
    dropTable("b_foi"); dropTable("b_fo")
    Lake.writeBucketed(layers.Wh.fctOrdersItems(ctx), "b_foi", 4, Seq("order_key"))
    Lake.writeBucketed(layers.Wh.fctOrders(ctx), "b_fo", 4, Seq("order_key"))
    val joined = spark.table("b_foi").select("order_key", "gross_item_sales_amount")
      .join(spark.table("b_fo").select("order_key", "order_priority_code"),
        Seq("order_key"))
      .groupBy("order_priority_code")
      .agg(sum("gross_item_sales_amount").as("rev"))
    val executed = joined.queryExecution.executedPlan
    def countShuffles(p: org.apache.spark.sql.execution.SparkPlan): Int =
      p.collectWithSubqueries { case _: ShuffleExchangeExec => 1 }.sum
    // join itself is shuffle-free; only the final small aggregation exchanges
    val n = countShuffles(executed)
    assert(n <= 1, s"expected at most the aggregation exchange, got $n shuffles:\n$executed")
    assert(joined.count() > 0)
  }

  test("entry() smoke: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("bench queries map and oracle map are consistent") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle entries without queries: ${o -- q}")
    // every declared query carries an oracle twin (rows+schema+hash checked)
    assert((q -- o).isEmpty, "unexpected rows-only queries")
  }
}
