package graft

import org.apache.spark.sql.functions._

/** The Zipf-vocabulary documents corpus (sources/Synth `documents_zipf`,
  * reached via the `synth:sf=N,docs=zipf` Ctx option): heavy-hitter bench
  * legs need a corpus where the candidate filter actually prunes — on the
  * fixed ~66-word vocab every token is a heavy hitter and the committed
  * ratio characterized that degenerate shape (PERF_NOTES_r10.md §2). This
  * spec pins (a) the Ctx remap, (b) the high-cardinality / skewed shape,
  * and (c) that the Misra-Gries + InSet-recount heavyHitters stays EXACTLY
  * equal to the naive full groupBy on this distribution too (the sketch
  * guarantee 1/denom > 2/cap is distribution-free; this is the regression
  * harness for it on production-shaped data). */
class ZipfCorpusSpec extends SparkSpec {

  private lazy val zctx = Ctx(spark, "synth:sf=0.02,docs=zipf")

  test("docs=zipf remaps the documents table; corpus is high-cardinality Zipf") {
    val toks = zctx.tbl("documents")
      .select(explode(expr("filter(split(lower(text), '\\\\s+'), x -> x != '')"))
        .as("tok"))
    val n = toks.count()
    val distinct = toks.distinct().count()
    // 1000 docs x ~50 words: a 66-word vocab would cap distinct at 66;
    // the Zipf draw over 1M ranks must produce thousands of distinct tokens
    assert(distinct > 5000, s"vocabulary too small for a Zipf corpus: $distinct")
    // skew: the single most frequent token (rank 0) carries a few percent
    // of all mass — far above uniform (1/distinct) — and under 15%
    val top = toks.groupBy("tok").count().orderBy(col("count").desc)
      .head().getLong(1)
    val share = top.toDouble / n
    assert(share > 0.02 && share < 0.15,
      s"top-token share $share outside the Zipf(s~1) band")
    // and the plain corpus is untouched by the option
    val plainDistinct = Ctx(spark, "synth:sf=0.02").tbl("documents")
      .select(explode(expr("filter(split(lower(text), '\\\\s+'), x -> x != '')"))
        .as("tok")).distinct().count()
    assert(plainDistinct < 100, s"plain corpus changed: $plainDistinct")
  }

  test("heavyHitters == naive full groupBy on the Zipf corpus (exactness)") {
    val sketch = extensions.Text.heavyHitters(zctx)
      .collect().map(_.toString).sorted.toSeq
    val toks = zctx.tbl("documents")
      .select(explode(expr("filter(split(lower(text), '\\\\s+'), x -> x != '')"))
        .as("tok"))
    val total = toks.count()
    val naive = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 500 > lit(total))
      .select(col("tok"), col("cnt"), lit(total).as("total_tokens"),
        graft.Macros.dv(col("cnt"), lit(total)).as("share"))
      .orderBy(col("cnt").desc, col("tok"))
      .collect().map(_.toString).sorted.toSeq
    assert(sketch.nonEmpty, "no heavy hitters found on the Zipf corpus")
    assert(sketch == naive,
      s"sketch != naive; sketch=${sketch.size} naive=${naive.size} rows")
  }
}
