package graft

import org.apache.spark.sql.functions._

/** The native dot_product must be bit-identical to the HOF fold it
  * replaces — including null-element, length-mismatch, and zero-vector
  * semantics — on real and adversarial inputs (same contract pattern as
  * CosineSimSpec / LshSignSpec). */
class DotProductSpec extends SparkSpec {

  private val hof =
    "aggregate(zip_with(a, b, (x, y) -> cast(x as double) * y), 0D, (acc, v) -> acc + v)"

  test("bit-identical to the aggregate(zip_with) fold on real embeddings") {
    graft.functions.DotProduct.register(spark)
    val e = ctx.tbl("embeddings")
    val pairs = e.select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(e.filter(col("vec_id") <= 20).select(col("embedding").as("b")))
    val diff = pairs
      .select(expr("dot_product(a, b)").as("nat"), expr(hof).as("ref"))
      .filter(!(col("nat") <=> col("ref")))
      .count()
    assert(diff == 0, s"$diff rows diverge from the HOF fold")
  }

  test("adversarial shapes: nulls, mismatched lengths, zeros, empties") {
    graft.functions.DotProduct.register(spark)
    import spark.implicits._
    val rows = Seq(
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)),
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)),
      (Seq[java.lang.Double](1.0), Seq[java.lang.Double](3.0, 4.0)),
      (Seq[java.lang.Double](0.0, 0.0), Seq[java.lang.Double](0.0, 0.0)),
      (Seq.empty[java.lang.Double], Seq.empty[java.lang.Double]),
      (Seq[java.lang.Double](1e300, 1e300), Seq[java.lang.Double](1e300, -1e300)))
      .toDF("a", "b")
    val diff = rows
      .select(expr("dot_product(a, b)").as("nat"), expr(hof).as("ref"))
      .filter(!(col("nat") <=> col("ref")))
      .count()
    assert(diff == 0)
    // empty arrays: the fold's 0D zero value
    val z = rows.filter(size(col("a")) === 0)
      .select(expr("dot_product(a, b)")).head().getDouble(0)
    assert(z == 0.0)
  }
}
