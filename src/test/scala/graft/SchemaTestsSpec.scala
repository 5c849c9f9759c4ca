package graft

import graft.layers._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's dbt schema tests re-expressed as Spark assertions
  * (models/wh/fct_orders.yml, models/wh/fct_orders_items.yml):
  * unique, not_null, and relationships (child->parent anti-join empty).
  */
class SchemaTestsSpec extends SparkSpec {

  private def assertUnique(df: DataFrame, col_ : String): Unit = {
    val total = df.count()
    val distinct = df.select(col_).distinct().count()
    assert(total == distinct, s"$col_ not unique: $total rows, $distinct distinct")
  }

  private def assertNotNull(df: DataFrame, cols: Seq[String]): Unit = {
    val nulls = df.filter(cols.map(c => col(c).isNull).reduce(_ || _)).count()
    assert(nulls == 0, s"null values present in ${cols.mkString(",")}")
  }

  private def assertRelationship(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): Unit = {
    val orphans = child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")
      .count()
    assert(orphans == 0, s"$childKey has $orphans orphan values")
  }

  test("fct_orders: unique + not_null (fct_orders.yml:9-60)") {
    val fo = Wh.fctOrders(ctx)
    assertUnique(fo, "order_key")
    assertNotNull(fo, Seq("order_key", "order_date", "customer_key",
      "order_status_code", "order_priority_code", "order_count",
      "gross_item_sales_amount", "item_discount_amount", "item_tax_amount",
      "net_item_sales_amount"))
  }

  test("fct_orders: relationships to dim_customer (fct_orders.yml:22-24)") {
    assertRelationship(Wh.fctOrders(ctx), "customer_key",
      Wh.dimCustomer(ctx), "customer_key")
  }

  test("fct_orders_items: unique + not_null (fct_orders_items.yml:9-144)") {
    val foi = Wh.fctOrdersItems(ctx)
    assertUnique(foi, "order_item_key")
    assertNotNull(foi, Seq("order_item_key", "order_key", "order_date",
      "customer_key", "part_key", "supplier_key", "quantity", "base_price",
      "discount_percentage", "tax_rate", "gross_item_sales_amount",
      "discounted_item_sales_amount", "item_discount_amount",
      "item_tax_amount", "net_item_sales_amount"))
  }

  test("fct_orders_items: relationships to dims (fct_orders_items.yml:26-49)") {
    val foi = Wh.fctOrdersItems(ctx)
    assertRelationship(foi, "customer_key", Wh.dimCustomer(ctx), "customer_key")
    assertRelationship(foi, "part_key", Wh.dimPart(ctx), "part_key")
    assertRelationship(foi, "supplier_key", Wh.dimSupplier(ctx), "supplier_key")
  }

  test("ods_parts_suppliers: surrogate key unique (parts_suppliers.sql:23)") {
    assertUnique(Ods.partsSuppliers(ctx), "part_supplier_key")
  }
}
