package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The native argmax_dot / argmax_cosine must pick the SAME candidate as
  * the crossJoin + max_by(id, struct(score, -id)) quantizer-assignment
  * plan they replace — max score, ties to the lowest id, null scores
  * skipped — with the per-candidate score doubles computed in the same
  * IEEE op order (dot_product / cosine_sim). Pinned on real embeddings
  * and on adversarial tie/zero/shape cases. */
class ArgmaxSpec extends SparkSpec {

  private def registerAll(): Unit = {
    graft.functions.DotProduct.register(spark)
    graft.functions.CosineSim.register(spark)
    graft.functions.ArgmaxDot.register(spark)
  }

  /** Pack (id, vec) candidates ascending-id into one row:
    * (mat flat, bias, ids). */
  private def pack(cands: DataFrame): DataFrame =
    cands.agg(
      expr("flatten(transform(array_sort(collect_list(struct(id, v))), x -> x.v))").as("mat"),
      expr("transform(array_sort(collect_list(struct(id, b))), x -> x.b)").as("bias"),
      expr("array_sort(collect_list(id))").as("ids"))

  test("argmax_dot matches crossJoin + max_by(code, struct(fit, -code)) on embeddings") {
    registerAll()
    import spark.implicits._
    val e = ctx.tbl("embeddings").limit(500)
    // candidates: 32 corpus vectors as 16-dim slices with a norm/2 bias —
    // exactly the PQ codeword-fit shape
    val cands = ctx.tbl("embeddings").filter(col("vec_id") <= 32)
      .select(col("vec_id").cast("int").as("id"),
        expr("slice(embedding, 1, 16)").as("v"))
      .withColumn("b", expr("dot_product(v, v) / 2"))
    val rows = e.select(col("vec_id"), expr("slice(embedding, 1, 16)").as("sv"))
    val viaJoin = rows.crossJoin(broadcast(cands))
      .select(col("vec_id"), col("id"),
        expr("dot_product(sv, v) - b").as("c"))
      .groupBy("vec_id")
      .agg(expr("max_by(id, struct(c, -id))").as("ref"))
    val viaExpr = rows.crossJoin(broadcast(pack(cands)))
      .select(col("vec_id"),
        expr("element_at(ids, argmax_dot(sv, mat, bias) + 1)").as("nat"))
    val diff = viaJoin.join(viaExpr, Seq("vec_id"))
      .filter(!(col("ref") <=> col("nat"))).count()
    assert(diff == 0, s"$diff assignments diverge from the max_by plan")
  }

  test("argmax_cosine matches crossJoin + max_by on embeddings, non-contiguous ids") {
    registerAll()
    val e = ctx.tbl("embeddings").limit(500)
    // ids deliberately sparse/non-contiguous: position -> id mapping must hold
    val cands = ctx.tbl("embeddings")
      .filter(col("vec_id") % 7 === 3 && col("vec_id") <= 200)
      .select(col("vec_id").cast("int").as("id"), col("embedding").as("v"))
      .withColumn("b", lit(0.0))
    val rows = e.select(col("vec_id"), col("embedding"))
    val viaJoin = rows.crossJoin(broadcast(cands))
      .select(col("vec_id"), col("id"),
        expr("cosine_sim(embedding, v)").as("c"))
      .groupBy("vec_id")
      .agg(expr("max_by(id, struct(c, -id))").as("ref"))
    val viaExpr = rows.crossJoin(broadcast(pack(cands)))
      .select(col("vec_id"),
        expr("element_at(ids, argmax_cosine(embedding, mat) + 1)").as("nat"))
    val diff = viaJoin.join(viaExpr, Seq("vec_id"))
      .filter(!(col("ref") <=> col("nat"))).count()
    assert(diff == 0, s"$diff assignments diverge from the max_by plan")
  }

  test("ties go to the lowest id; null-score candidates skipped; degenerate shapes null") {
    registerAll()
    import spark.implicits._
    // duplicate candidate vectors => exact score tie => position of the
    // LOWER id must win, exactly max_by(id, struct(score, -id))
    val probe = Seq((Seq(1.0f, 0.0f),
      // candidates in id order: 0 = zero-norm (null cosine, skipped),
      // 1 and 2 identical (tie -> 1), 3 worse
      Seq(0.0f, 0.0f, /*1*/ 1.0f, 1.0f, /*2*/ 1.0f, 1.0f, /*3*/ -1.0f, 0.0f)))
      .toDF("v", "mat")
    assert(probe.select(expr("argmax_cosine(v, mat)")).head().getInt(0) == 1)
    // argmax_dot tie: identical dot-bias scores -> first position
    val probeDot = Seq((Seq(1.0f, 2.0f),
      Seq(3.0f, 4.0f, 3.0f, 4.0f, 9.0f, 9.0f),
      Seq(0.0, 0.0, 100.0))).toDF("v", "mat", "bias")
    assert(probeDot.select(expr("argmax_dot(v, mat, bias)")).head().getInt(0) == 0)
    // zero-norm input vector -> null (cosine undefined everywhere)
    val zeroV = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 1.0f))).toDF("v", "mat")
    assert(zeroV.select(expr("argmax_cosine(v, mat)")).head().isNullAt(0))
    // shape mismatch (|mat| not a multiple of |v| / != |bias|*|v|) -> null
    val bad = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f), Seq(0.0)))
      .toDF("v", "mat", "bias")
    assert(bad.select(expr("argmax_cosine(v, mat)")).head().isNullAt(0))
    assert(bad.select(expr("argmax_dot(v, mat, bias)")).head().isNullAt(0))
    // empty vector -> null
    val empty = Seq((Seq.empty[Float], Seq.empty[Float])).toDF("v", "mat")
    assert(empty.select(expr("argmax_cosine(v, mat)")).head().isNullAt(0))
  }
}
