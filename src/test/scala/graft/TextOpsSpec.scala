package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-3 text-pipeline additions (repetition signals,
  * chunk-level dedup, stratified sampling, tf/df top terms) on a crafted
  * corpus where every expected value is known by construction. */
class TextOpsSpec extends SparkSpec {
  import extensions.Text

  private lazy val fixtureDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_textops").toString
    val w = (0 until 10).map(i => s"w$i").mkString(" ")   // 10 distinct tokens
    val u = (0 until 10).map(i => s"u$i").mkString(" ")
    val rows = Seq(
      // doc 0: two 10-token chunks, all 20 tokens distinct
      (0L, s"$w $u", "en", "srcA"),
      // doc 1: first chunk COPIES doc 0's first chunk, second chunk is new
      (1L, s"$w " + (0 until 10).map(i => s"v$i").mkString(" "), "en", "srcA"),
      // doc 2: one token repeated 10x — maximally repetitive, one chunk
      (2L, Seq.fill(10)("x").mkString(" "), "en", "srcA"),
      // doc 3: too short for any chunk
      (3L, "a b", "fr", "srcB"),
      // doc 4: other source sharing token w0 with srcA
      (4L, "w0 y1 y2", "fr", "srcB"))
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }
  private lazy val fctx = Ctx(spark, fixtureDir)

  test("dedupChunks: copied first chunk is flagged against the earlier doc") {
    val rows = Text.dedupChunks(fctx).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(4)))
      .toMap
    assert(rows(0L) == ((2L, 0L, false)))      // owner doc: nothing duplicated
    assert(rows(1L) == ((2L, 1L, true)))       // 1 of 2 chunks copied -> >= 0.5
    assert(rows(2L) == ((1L, 0L, false)))      // unique chunk of x's
    assert(!rows.contains(3L) && !rows.contains(4L)) // < 10 tokens: no chunks
  }

  test("repetition: constant doc maxes every signal, distinct doc zeroes them") {
    val byDoc = Text.repetition(fctx).collect()
      .map(r => r.getLong(0) -> r).toMap
    val const = byDoc(2L)
    assert(const.getDouble(3) == 0.1)          // unique_token_ratio = 1/10
    assert(const.getDouble(4) == 1.0)          // top_token_share
    assert(const.getDouble(5) == 1.0)          // top_bigram_share
    assert(const.getDouble(6) == 1.0)          // dup_trigram_frac
    assert(const.getBoolean(7))                // is_repetitive
    val distinct = byDoc(0L)
    assert(distinct.getDouble(3) == 1.0)
    assert(distinct.getDouble(6) == 0.0)
    assert(!distinct.getBoolean(7))
  }

  test("bigramLm: continuation counts and probabilities by construction") {
    val rows = Text.bigramLm(fctx).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // head 'x' (doc 2 is "x"*10): only continuation is 'x', 9 pairs
    assert(rows(("x", 1)) == (("x", 9L, 9L, 1.0)))
    // head 'w0': followed by w1 in docs 0 and 1, by y1 in doc 4
    assert(rows(("w0", 1)) == (("w1", 2L, 3L, 2.0 / 3.0)))
    assert(rows(("w0", 2)) == (("y1", 1L, 3L, 1.0 / 3.0)))
    // doc 3 "a b": a single bigram with probability 1
    assert(rows(("a", 1)) == (("b", 1L, 1L, 1.0)))
  }

  test("lmScore: conditional-probability fit by construction") {
    // denom = 1 makes "predictable" mean p(w2|w1) == 1 exactly, which the
    // fixture pins by construction (a corpus this small cannot exercise
    // the production 1/32 threshold — the sf sweeps do)
    val rows = Text.lmScore(fctx, denom = 1).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.size == 5, "one verdict row per document")
    // doc 2 ("x" * 10): every one of its 9 bigrams is (x,x) with p = 1
    assert(rows(2L).getLong(1) == 9 && rows(2L).getLong(2) == 9)
    assert(rows(2L).getDouble(3) == 1.0 && rows(2L).getDouble(4) == 1.0)
    // doc 0: 19 bigrams; only the two seams are uncertain — (w0,w1) shares
    // head w0 with doc 4's (w0,y1) so p = 2/3, and (w9,u0) forks against
    // doc 1's (w9,v0) so p = 1/2; the other 17 continuations are certain
    assert(rows(0L).getLong(1) == 19 && rows(0L).getLong(2) == 17)
    assert(math.abs(rows(0L).getDouble(4) - (2.0 / 3 + 0.5 + 17) / 19) < 1e-6)
    // doc 4: (w0,y1) p = 1/3 (unpredictable), (y1,y2) p = 1
    assert(rows(4L).getLong(1) == 2 && rows(4L).getLong(2) == 1)
    assert(rows(4L).getDouble(3) == 0.5)
  }

  test("lmScore: a doc too short for bigrams still gets a verdict row") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lm_short").toString
    import spark.implicits._
    Seq((0L, "solo", "en", "s"), (1L, "a a a", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val m = Text.lmScore(Ctx(spark, dir)).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m.size == 2, "the unscorable doc must not be dropped")
    assert(m(0L).getLong(1) == 0 && m(0L).getLong(2) == 0)
    assert(m(0L).isNullAt(3) && m(0L).isNullAt(4))
    assert(m(1L).getLong(1) == 2 && m(1L).getDouble(4) == 1.0)
  }

  test("sampleStratified: membership is the md5-prefix rule, per stratum") {
    val expected = fctx.tbl("documents")
      .select(col("lang"), col("doc_id"),
        (substring(md5(concat(lit("sample|"), col("doc_id").cast("string"))), 1, 4)
          < "4000").as("keep"))
      .groupBy("lang").agg(sum(when(col("keep"), 1L).otherwise(0L)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Text.sampleStratified(fctx).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == expected)
    assert(got.keySet == Set("en", "fr"))
  }

  test("sourceTopTerms: score is tf/df and ranks are dense per source") {
    val rows = Text.sourceTopTerms(fctx).collect()
    val bySrc = rows.groupBy(_.getString(0))
    bySrc.values.foreach { rs =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length))
      rs.foreach(r => assert(r.getDouble(5) == r.getLong(3).toDouble / r.getLong(4)))
    }
    // w0 appears in both sources -> df 2; every other srcB token is df 1
    val w0 = rows.filter(_.getString(2) == "w0")
    assert(w0.nonEmpty && w0.forall(_.getLong(4) == 2L))
  }

  test("dedupSimhashNear: empty corpus returns empty, both cost paths") {
    // sum over zero groups is NULL — the cost probe must coalesce to 0,
    // not NPE, when maxDist == 2 forces the mass evaluation.
    val dir = java.nio.file.Files.createTempDirectory("graft_textops_empty").toString
    import spark.implicits._
    Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val ectx = Ctx(spark, dir)
    assert(Text.dedupSimhashNear(ectx, maxDist = 2).count() == 0L)
    assert(Text.dedupSimhashNear(ectx, maxDist = 1).count() == 0L)
  }
}
