package graft

import graft.layers.Ods
import org.apache.spark.sql.functions._

/** Properties of the price decomposition (reference
  * models/ods/orders_items.sql:43-82) and of the exact-division macro.
  */
class PriceIdentitySpec extends SparkSpec {

  test("orders_items: net = gross + discount + tax within money rounding") {
    val bad = Ods.ordersItems(ctx)
      .select(
        (col("gross_item_sales_amount") + col("item_discount_amount")
          + col("item_tax_amount") - col("net_item_sales_amount"))
          .cast("double").as("residual"))
      .filter(abs(col("residual")) > 0.0001)
      .count()
    assert(bad == 0, s"$bad rows violate the price identity beyond rounding")
  }

  test("orders_items: discounted amount = gross * (1 - discount) within rounding") {
    val bad = Ods.ordersItems(ctx)
      .select((col("discounted_item_sales_amount")
        - col("gross_item_sales_amount") * (lit(1) - col("discount_percentage")))
        .cast("double").as("residual"))
      .filter(abs(col("residual")) > 0.0001)
      .count()
    assert(bad == 0)
  }

  test("moneyDiv: exact round-half-up division (property, 5000 cases)") {
    // moneyDiv's scaled-long arithmetic must equal BigDecimal division
    // HALF_UP at scale 4 — the contract that makes base_price engine-portable.
    val rnd = new scala.util.Random(42)
    (1 to 5000).foreach { _ =>
      val extCents = 1L + rnd.nextLong(99999999L)
      val qty = 1L + rnd.nextLong(500L)
      val ext = BigDecimal(extCents, 2)
      val e = (ext * 10000).toLongExact * 20000
      val qScaled = qty * 10000L
      val r = (e + qScaled) / (2 * qScaled)
      val expected = (ext / BigDecimal(qty))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)
      assert(BigDecimal(r, 4) == expected,
        s"ext=$ext qty=$qty got ${BigDecimal(r, 4)} want $expected")
    }
  }
}
