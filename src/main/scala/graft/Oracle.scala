package graft

/** DuckDB oracle SQL library. Each fragment is the exact textual twin of a
  * Spark model in graft.layers — see the parity rules in [[Macros]].
  *
  * All CTE names are prefixed (base_/o_/w_) so they never shadow the raw
  * parquet table names (`region nation customer supplier part orders
  * lineitem documents embeddings events`) the driver registers in DuckDB.
  */
object Oracle {
  // ---- textual twins of Macros ----
  def money(e: String) = s"CAST($e AS DECIMAL(16,4))"
  def moneyR(e: String) = s"CAST(ROUND($e, 4) AS DECIMAL(16,4))"
  def pin4(e: String) = s"CAST($e AS DECIMAL(38,4))"
  /** Twin of Macros.rnd: DuckDB's native ROUND on double is bit-identical to
    * Spark's round(x*10^s, 0)/10^s (empirically verified) — the reference's
    * presentational round(x, s) is restored on every ratio output. */
  def rnd(e: String, s: Int) = s"ROUND($e, $s)"
  def rndDec(e: String, s: Int) = s"CAST(ROUND($e, $s) AS DOUBLE)"
  /** Twin of Macros.moneyDiv: exact integer round-half-up division. */
  def moneyDiv(numer: String, denom: String) =
    s"""CAST(CAST((CAST($numer * 10000 AS BIGINT) * 20000
       |     + CAST(NULLIF($denom, 0) * 10000 AS BIGINT))
       |    // (2 * CAST(NULLIF($denom, 0) * 10000 AS BIGINT)) AS DECIMAL(16,0))
       |  * CAST(0.0001 AS DECIMAL(5,4)) AS DECIMAL(16,4))""".stripMargin
  def dv(a: String, b: String) = s"(CAST($a AS DOUBLE) / CAST($b AS DOUBLE))"
  def avgE(e: String) = s"(CAST(SUM($e) AS DOUBLE) / COUNT($e))"
  /** Twin of Macros.stddevE — deterministic sample stddev from exact sums. */
  def stddevE(e: String) =
    s"SQRT((CAST(SUM(($e) * ($e)) AS DOUBLE) - CAST(SUM($e) AS DOUBLE) * CAST(SUM($e) AS DOUBLE) / CAST(COUNT($e) AS DOUBLE)) / (CAST(COUNT($e) AS DOUBLE) - 1))"
  /** Decimal aggregate -> double at the output boundary (twin of outD). */
  def sumD(e: String) = s"CAST(SUM($e) AS DOUBLE)"
  def d(e: String) = s"CAST($e AS DOUBLE)"

  /** Full-table dump with decimal columns lowered to double (twin of
    * Macros.outD): cols marked true are decimal in the CTE. */
  def dump(table: String, cols: Seq[(String, Boolean)], key: String): String =
    cols.map { case (c, dec) => if (dec) s"CAST($c AS DOUBLE) AS $c" else c }
      .mkString("SELECT ", ", ", s" FROM $table ORDER BY $key")
  def sk(cols: String*): String =
    cols.map(c => s"COALESCE(CAST($c AS VARCHAR), '_dbt_utils_surrogate_key_null_')")
      .mkString("MD5(", " || '-' || ", ")")

  /** Whole CTE library; unused CTEs are ignored by DuckDB's planner, so every
    * oracle query simply prepends the full set. */
  val CTES: String = s"""
-- base layer: reference models/base/ (all 8 files) (rename + money cast; testdata
-- subset: comment/address/phone/clerk/commit/receipt columns absent)
base_line_item AS (
  SELECT l_orderkey AS order_key, l_partkey AS part_key, l_suppkey AS supplier_key,
         l_linenumber AS order_line_number,
         ${money("l_quantity")} AS quantity,
         ${money("l_extendedprice")} AS extended_price,
         ${money("l_discount")} AS discount_percentage,
         ${money("l_tax")} AS tax_rate,
         l_returnflag AS return_status_code,
         l_linestatus AS order_line_status_code,
         CAST(l_shipdate AS DATE) AS ship_date,
         CAST(l_shipdate AS DATE) + CAST((l_orderkey * 7 + l_linenumber * 3) % 61 - 30 AS INT) AS commit_date,
         CAST(l_shipdate AS DATE) + CAST(1 + (l_orderkey * 11 + l_partkey * 5) % 30 AS INT) AS receipt_date,
         (['AIR','FOB','MAIL','RAIL','REG AIR','SHIP','TRUCK'])[CAST((l_orderkey + l_linenumber) % 7 + 1 AS INT)] AS ship_mode_name
  FROM lineitem),
base_orders AS (
  SELECT o_orderkey AS order_key, o_custkey AS customer_key,
         o_orderstatus AS order_status_code,
         ${money("o_totalprice")} AS order_amount,
         CAST(o_orderdate AS DATE) AS order_date,
         o_orderpriority AS order_priority_code
  FROM orders),
base_customer AS (
  SELECT c_custkey AS customer_key, c_name AS customer_name,
         c_nationkey AS nation_key,
         ${money("c_acctbal")} AS customer_account_balance,
         c_mktsegment AS customer_market_segment_name
  FROM customer),
base_supplier AS (
  SELECT s_suppkey AS supplier_key, s_name AS supplier_name,
         s_nationkey AS nation_key,
         ${money("s_acctbal")} AS supplier_account_balance
  FROM supplier),
base_part AS (
  SELECT p_partkey AS part_key, p_name AS part_name, p_brand AS part_brand_name,
         p_type AS part_type_name, p_size AS part_size,
         ${money("p_retailprice")} AS retail_price
  FROM part),
base_nation AS (
  SELECT n_nationkey AS nation_key, n_name AS nation_name, n_regionkey AS region_key
  FROM nation),
base_region AS (
  SELECT r_regionkey AS region_key, r_name AS region_name
  FROM region),
-- synthesized partsupp (testdata has none): deterministic over the distinct
-- (part,supplier) pairs present in lineitem; formulas exactly mirrored in
-- graft.layers.Ods.partSupp
base_part_supplier AS (
  SELECT ps.part_key, ps.supplier_key,
         CAST(((ps.part_key * 11 + ps.supplier_key * 17) % 9973) + 10 AS INT) AS supplier_availabe_quantity,
         ${moneyR("(p.retail_price * (50 + (ps.part_key * 7 + ps.supplier_key * 3) % 41)) * CAST(0.01 AS DECIMAL(3,2))")} AS supplier_cost_amount
  FROM (SELECT DISTINCT l_partkey AS part_key, l_suppkey AS supplier_key FROM lineitem) ps
  JOIN base_part p ON ps.part_key = p.part_key),
-- ods.orders_items stage 1 (reference models/ods/orders_items.sql:16-51)
o_oi0 AS (
  SELECT ${sk("o.order_key", "l.order_line_number", "l.part_key", "l.supplier_key", "l.quantity", "l.extended_price", "l.ship_date")} AS order_item_key,
         o.order_key, o.order_date, o.customer_key, o.order_status_code,
         l.part_key, l.supplier_key, l.return_status_code, l.order_line_number,
         l.order_line_status_code, l.ship_date, l.commit_date, l.receipt_date,
         l.ship_mode_name,
         l.quantity, l.discount_percentage, l.tax_rate, l.extended_price,
         ${moneyDiv("l.extended_price", "l.quantity")} AS base_price,
         ${moneyR("l.extended_price * (1 - l.discount_percentage)")} AS discounted_item_sales_amount,
         ${moneyR("-1 * l.extended_price * l.discount_percentage")} AS item_discount_amount
  FROM base_orders o JOIN base_line_item l ON o.order_key = l.order_key),
-- ods.orders_items final (reference models/ods/orders_items.sql:52-86)
o_oi AS (
  SELECT order_item_key, order_key, order_date, customer_key, order_status_code,
         part_key, supplier_key, return_status_code, order_line_number,
         order_line_status_code, ship_date, commit_date, receipt_date,
         ship_mode_name, quantity, base_price,
         discount_percentage,
         ${moneyR("base_price * (1 - discount_percentage)")} AS discounted_price,
         extended_price AS gross_item_sales_amount,
         discounted_item_sales_amount,
         item_discount_amount,
         tax_rate,
         ${moneyR("(extended_price + item_discount_amount) * tax_rate")} AS item_tax_amount,
         ${moneyR("extended_price + item_discount_amount + ((extended_price + item_discount_amount) * tax_rate)")} AS net_item_sales_amount
  FROM o_oi0),
-- ods.parts_suppliers (reference models/ods/parts_suppliers.sql)
o_ps AS (
  SELECT ${sk("p.part_key", "s.supplier_key")} AS part_supplier_key,
         p.part_key, p.part_name, p.part_brand_name, p.part_type_name,
         p.part_size, p.retail_price,
         s.supplier_key, s.supplier_name, s.nation_key,
         ps.supplier_availabe_quantity, ps.supplier_cost_amount
  FROM base_part p
  JOIN base_part_supplier ps ON p.part_key = ps.part_key
  JOIN base_supplier s ON ps.supplier_key = s.supplier_key),
-- wh.dim_part_supplier_xrf (reference models/wh/dim_part_supplier_xrf.sql)
w_xrf AS (
  SELECT ps.part_supplier_key, ps.part_key, ps.part_name, ps.part_brand_name,
         ps.part_type_name, ps.part_size, ps.retail_price,
         ps.supplier_key, ps.supplier_name, s.supplier_account_balance,
         n.nation_key AS supplier_nation_key, n.nation_name AS supplier_nation_name,
         r.region_key AS supplier_region_key, r.region_name AS supplier_region_name,
         ps.supplier_availabe_quantity, ps.supplier_cost_amount
  FROM o_ps ps
  JOIN base_supplier s ON ps.supplier_key = s.supplier_key
  JOIN base_nation n ON ps.nation_key = n.nation_key
  JOIN base_region r ON n.region_key = r.region_key),
-- wh.dim_customer / dim_supplier / dim_part (reference models/wh/ dim models,
-- housekeeping columns excluded: nondeterministic by design)
w_dim_customer AS (
  SELECT c.customer_key, c.customer_name,
         n.nation_key AS customer_nation_key, n.nation_name AS customer_nation_name,
         r.region_key AS customer_region_key, r.region_name AS customer_region_name,
         c.customer_account_balance, c.customer_market_segment_name
  FROM base_customer c
  JOIN base_nation n ON c.nation_key = n.nation_key
  JOIN base_region r ON n.region_key = r.region_key),
w_dim_supplier AS (
  SELECT s.supplier_key, s.supplier_name,
         n.nation_key AS supplier_nation_key, n.nation_name AS supplier_nation_name,
         r.region_key AS supplier_region_key, r.region_name AS supplier_region_name,
         s.supplier_account_balance
  FROM base_supplier s
  JOIN base_nation n ON s.nation_key = n.nation_key
  JOIN base_region r ON n.region_key = r.region_key),
w_dim_part AS (
  SELECT part_key, part_name, part_brand_name, part_type_name, part_size, retail_price
  FROM base_part),
-- wh.fct_orders (reference models/wh/fct_orders.sql)
w_fct_orders AS (
  SELECT o.order_key, o.order_date, o.customer_key, o.order_status_code,
         o.order_priority_code, 1 AS order_count,
         s.gross_item_sales_amount, s.item_discount_amount,
         s.item_tax_amount, s.net_item_sales_amount
  FROM base_orders o
  JOIN (SELECT order_key,
               ${pin4("SUM(gross_item_sales_amount)")} AS gross_item_sales_amount,
               ${pin4("SUM(item_discount_amount)")} AS item_discount_amount,
               ${pin4("SUM(item_tax_amount)")} AS item_tax_amount,
               ${pin4("SUM(net_item_sales_amount)")} AS net_item_sales_amount
        FROM o_oi GROUP BY order_key) s
    ON o.order_key = s.order_key),
-- wh.fct_orders_items (reference models/wh/fct_orders_items.sql)
w_fct_orders_items AS (
  SELECT o.order_item_key, o.order_key, o.order_date, o.customer_key,
         o.order_status_code, o.part_key, o.supplier_key, o.return_status_code,
         o.order_line_number, o.order_line_status_code, o.ship_date,
         o.commit_date, o.receipt_date, o.ship_mode_name,
         ps.supplier_cost_amount, o.base_price, o.discount_percentage,
         o.discounted_price, o.tax_rate, 1 AS order_item_count, o.quantity,
         o.gross_item_sales_amount, o.discounted_item_sales_amount,
         o.item_discount_amount, o.item_tax_amount, o.net_item_sales_amount
  FROM o_oi o
  JOIN o_ps ps ON o.part_key = ps.part_key AND o.supplier_key = ps.supplier_key)
"""

  /** Compose a full oracle query: shared CTE library + the query body. */
  def q(body: String): String = s"WITH $CTES\n$body"

  /** Same, but RECURSIVE — for oracle twins that need a recursive CTE
    * (DuckDB allows WITH RECURSIVE even when most CTEs are plain). */
  def qr(body: String): String = s"WITH RECURSIVE $CTES\n$body"
}
