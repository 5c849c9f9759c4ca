package graft

import graft.functions.BitHamming
import org.apache.spark.sql.functions._

/** The native bit_hamming expression: interpreted + codegen paths through a
  * real DataFrame, plus the multi-index Hamming-join completeness property. */
class BitHammingSpec extends SparkSpec {

  test("bit_hamming: correct distances through codegen") {
    BitHamming.register(spark)
    import spark.implicits._
    val df = Seq(
      ("0000", "0000", 0), ("0001", "0000", 1), ("1111", "0000", 4),
      ("10", "1011", 2), ("0110100110010110", "0110100110010110", 0),
      ("0110100110010110", "1110100110010111", 2))
      .toDF("a", "b", "expected")
    val bad = df.withColumn("got", expr("bit_hamming(a, b)"))
      .filter(col("got") =!= col("expected")).count()
    assert(bad == 0)
  }

  test("bit_hamming: null propagation") {
    BitHamming.register(spark)
    import spark.implicits._
    val r = Seq((Option("0101"), Option.empty[String])).toDF("a", "b")
      .selectExpr("bit_hamming(a, b)").collect()
    assert(r.head.isNullAt(0))
  }

  test("multi-index Hamming join finds every pair the brute force finds") {
    // pigeonhole completeness: chunked candidates must cover all pairs with
    // distance <= 2 found by an all-pairs scan over the same simhashes
    BitHamming.register(spark)
    val near = extensions.Text.dedupSimhashNear(ctx)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = extensions.Text.dedupSimhash(ctx).select("doc_id", "simhash")
    val brute = sim.as("a").crossJoin(sim.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .withColumn("h", expr("bit_hamming(a.simhash, b.simhash)"))
      .filter(col("h") <= 2)
      .select(col("a.doc_id"), col("b.doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(near == brute, s"multi-index missed ${(brute -- near).size} pairs")
  }

  test("cost-based path choice: flip path and chunk path agree exactly") {
    // dedupSimhashNear picks chunk-join vs meet-in-the-middle from the
    // measured candidate mass; both must be EXACT, so forcing each via the
    // threshold conf must yield the same (doc_a, doc_b, hamming) set
    BitHamming.register(spark)
    def pairs() = extensions.Text.dedupSimhashNear(ctx)
      .select("doc_a", "doc_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val key = "spark.graft.simhash.maxChunkPairs"
    spark.conf.set(key, Long.MaxValue.toString) // mass never exceeds: chunk join
    val chunk = pairs()
    spark.conf.set(key, "0")                    // mass always exceeds: flip path
    val flip =
      try pairs()
      finally spark.conf.unset(key)
    assert(flip == chunk,
      s"path disagreement: flip-only ${(flip -- chunk).size}, chunk-only ${(chunk -- flip).size}")
  }
}
