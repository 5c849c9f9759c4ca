package graft

import org.apache.spark.sql.DataFrame
import scala.collection.immutable.ListMap
import Oracle.q

/** Shared model/oracle plumbing for the per-layer registry files
  * (RegistryModels / RegistryIntermediate / RegistryReports /
  * RegistrySupply / RegistryExtensions): the materialization tag, the
  * entry type pairing a Spark plan builder with its DuckDB oracle twin,
  * and the dump column lists. Registry re-exports Mat/Entry so external
  * callers keep their Registry.Mat / Registry.Entry spelling. Deliberately
  * free of any dependency on Registry itself — the per-layer objects
  * initialize from here alone, so object-initialization order between the
  * files can never cycle. */
object OracleModel {
  /** Materialization tag — the dbt_project.yml twin (reference
    * dbt_project.yml:31-36: ods/wh tables, intermediate views, metrics/
    * reports tables). Runner.buildAll filters on this instead of name
    * prefixes, so model naming can never silently change what gets built. */
  sealed abstract class Mat
  object Mat {
    /** ods-layer table (first build phase, no housekeeping). */
    case object OdsTable extends Mat
    /** wh-layer table (second build phase, housekeeping columns). */
    case object WhTable extends Mat
    /** dbt view model — re-derived per consumer, never materialized. */
    case object View extends Mat
    /** metrics/reports table (generic third build phase). */
    case object Table extends Mat
    /** extension operator — not a dbt model, not part of the build. */
    case object Extension extends Mat
  }

  final case class Entry(fn: Ctx => DataFrame, sql: Option[String],
      mat: Mat = Mat.Table)

  def e(fn: Ctx => DataFrame, sql: String): Entry = Entry(fn, Some(q(sql)))

  private[graft] def tagged(m: ListMap[String, Entry], mat: String => Mat): ListMap[String, Entry] =
    m.map { case (n, en) => n -> en.copy(mat = mat(n)) }

  val T = true  // decimal column in a dump
  val F = false

  // column lists for full-table dumps (decimal-marked), kept in lockstep
  // with the layer functions and Oracle.CTES
  private[graft] val oiCols = Seq(
    "order_item_key" -> F, "order_key" -> F, "order_date" -> F,
    "customer_key" -> F, "order_status_code" -> F, "part_key" -> F,
    "supplier_key" -> F, "return_status_code" -> F, "order_line_number" -> F,
    "order_line_status_code" -> F, "ship_date" -> F, "commit_date" -> F,
    "receipt_date" -> F, "ship_mode_name" -> F, "quantity" -> T,
    "base_price" -> T, "discount_percentage" -> T, "discounted_price" -> T,
    "gross_item_sales_amount" -> T, "discounted_item_sales_amount" -> T,
    "item_discount_amount" -> T, "tax_rate" -> T, "item_tax_amount" -> T,
    "net_item_sales_amount" -> T)

  private[graft] val foiCols = Seq(
    "order_item_key" -> F, "order_key" -> F, "order_date" -> F,
    "customer_key" -> F, "order_status_code" -> F, "part_key" -> F,
    "supplier_key" -> F, "return_status_code" -> F, "order_line_number" -> F,
    "order_line_status_code" -> F, "ship_date" -> F, "commit_date" -> F,
    "receipt_date" -> F, "ship_mode_name" -> F,
    "supplier_cost_amount" -> T, "base_price" -> T, "discount_percentage" -> T,
    "discounted_price" -> T, "tax_rate" -> T, "order_item_count" -> F,
    "quantity" -> T, "gross_item_sales_amount" -> T,
    "discounted_item_sales_amount" -> T, "item_discount_amount" -> T,
    "item_tax_amount" -> T, "net_item_sales_amount" -> T)
}
