package graft

import graft.functions.MinHashSig16
import org.apache.spark.sql.functions._

/** The native minhash16_sig expression: value-identical to the composed
  * md5-slice formula the DuckDB oracle runs (RegistryExtensions.duckSig16Body), plus
  * null/empty semantics, through a real DataFrame (codegen path). */
class MinHashSigSpec extends SparkSpec {

  test("minhash16_sig equals the composed transform/array_min form") {
    MinHashSig16.register(spark)
    import spark.implicits._
    val df = Seq(
      Seq("the quick brown", "quick brown fox", "brown fox jumps"),
      Seq("a"),
      Seq("x y z", "x y z"), // duplicate elements must not matter for min
      (1 to 100).map(i => s"shingle number $i with some text"),
      Seq("", "non-empty"), // empty-string shingle is a valid value
      Seq("ünïcödé shingle", "ascii shingle")) // multi-byte UTF-8
      .toDF("shingles")
    val mhCat = (0 until 4).map(j => s"md5(concat('$j|', x))")
      .mkString("transform(shingles, x -> concat(", ", ", "))")
    val composed = (0 until 16).map(i =>
      expr(s"array_min(transform($mhCat, h -> substring(h, ${8 * i + 1}, 8)))")
        .as(s"e$i"))
    val bad = df
      .withColumn("hs", expr("minhash16_sig(shingles)"))
      .select(col("hs") +: composed: _*)
      .filter((0 until 16).map(i => col("hs")(i) =!= col(s"e$i")).reduce(_ || _))
      .count()
    assert(bad == 0)
  }

  test("minhash16_sig equals the composed form on random inputs (property, 500 arrays)") {
    MinHashSig16.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val alphabet = "abcXYZ 0189 .,|'éü漢é" // multi-byte + the '|' seed separator
    def randString() =
      (0 until (1 + rnd.nextInt(20))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val df = (1 to 500)
      .map(_ => (0 until (1 + rnd.nextInt(30))).map(_ => randString()))
      .toDF("shingles")
    val mhCat = (0 until 4).map(j => s"md5(concat('$j|', x))")
      .mkString("transform(shingles, x -> concat(", ", ", "))")
    val composed = (0 until 16).map(i =>
      expr(s"array_min(transform($mhCat, h -> substring(h, ${8 * i + 1}, 8)))")
        .as(s"e$i"))
    val bad = df
      .withColumn("hs", expr("minhash16_sig(shingles)"))
      .select(col("hs") +: composed: _*)
      .filter((0 until 16).map(i => col("hs")(i) =!= col(s"e$i")).reduce(_ || _))
      .count()
    assert(bad == 0)
  }

  test("minhash16_sig: null and empty arrays yield null") {
    MinHashSig16.register(spark)
    import spark.implicits._
    val r = Seq((1, Seq("a")), (2, Seq.empty[String]))
      .toDF("id", "shingles")
      .select(col("id"), expr("minhash16_sig(shingles)").as("hs"))
      .union(spark.sql("SELECT 3, minhash16_sig(CAST(NULL AS ARRAY<STRING>))"))
      .orderBy("id").collect()
    assert(!r(0).isNullAt(1) && r(0).getSeq[String](1).length == 16)
    assert(r(1).isNullAt(1), "empty array must be null (array_min semantics)")
    assert(r(2).isNullAt(1), "null input must be null")
  }

  test("minhash16_sig: non-array<string> argument is an analysis error, not a runtime cast") {
    MinHashSig16.register(spark)
    import spark.implicits._
    val df = Seq((1L, Seq(2.0))).toDF("doc_id", "vec")
    for (bad <- Seq("minhash16_sig(doc_id)", "minhash16_sig(vec)")) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        df.select(expr(bad)).collect()
      }
      assert(e.getMessage.toLowerCase.contains("array<string>"),
        s"expected type-check message for $bad, got: ${e.getMessage}")
    }
  }
}
