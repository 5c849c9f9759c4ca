package graft

/** The SQL surface: models registered as temp views and queried with plain
  * Spark SQL, dbt-style. */
class CatalogSpec extends SparkSpec {

  test("registerAll exposes raw tables, models, and functions to SQL") {
    Catalog.registerAll(ctx)
    val r = spark.sql(
      """SELECT c.customer_region_name, count(*) AS n,
        |       bit_hamming('0101', '1101') AS h
        |FROM fct_orders o JOIN dim_customer c ON o.customer_key = c.customer_key
        |GROUP BY 1, 3 ORDER BY 1""".stripMargin).collect()
    assert(r.length == 5)                       // five regions
    assert(r.forall(_.getInt(2) == 1))          // custom function usable in SQL
    assert(spark.sql("SELECT count(*) FROM lineitem").head().getLong(0) > 0)
  }
}
