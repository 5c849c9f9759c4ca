package graft.extensions

import graft.{Ctx, Versioned}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted IVFADC index — the build-once / query-many production shape
  * of [[Similarity.annIvfPq]] (reference: the FAISS index-file lifecycle;
  * the r9 probe measured the build at 564 s for 2M vectors at SF100, which
  * is exactly the cost a serving path must NOT pay per query batch).
  *
  * [[build]] computes the three index relations plus the rerank corpus and
  * publishes each as a [[graft.Versioned]] manifest table under `dir`:
  *
  *   - `seeds`      (cell_id, se)            — coarse-quantizer centroids
  *   - `codebooks`  (s, code, cv)            — per-subspace PQ codewords
  *   - `coded`      (vec_id, cell_id, codes) — each corpus vector's cell
  *     assignment and its 8 PQ codes packed in subspace order (the 8-byte
  *     production encoding, kept as array<int> for plan inspectability)
  *   - `vectors`    (vec_id, embedding)      — full floats, rerank-only
  *
  * Versioned (not bare parquet) is what makes this production-shaped: an
  * index REBUILD publishes all four relations as new snapshots readable
  * only when complete (readers of the old index are never disturbed
  * mid-rebuild — snapshot isolation), and a crashed rebuild leaves the
  * prior version fully servable. The four tables commit independently;
  * [[query]] pins one version per table at entry, so a serving call is
  * internally consistent once builds are serialized (one writer at a time
  * — the operational norm for index rebuilds; cross-table atomicity would
  * need a wrapping meta-manifest, out of scope here).
  *
  * [[query]] serves the composed IVFADC pipeline FROM the persisted tables
  * — probe nprobe cells, ADC-score only coded vectors in probed cells (no
  * floats touched), exact-rerank only the top-`shortlist` — with the same
  * deterministic tie-breaks and decimal-rounded ADC sums as
  * [[Similarity.annIvfPq]]; AnnIndexSpec proves the served results are
  * row-identical to the unpersisted composition.
  *
  * At 100 TB: the build is the linear encode pass (broadcast seeds +
  * codebooks) paid once; a query batch reads manifest-listed parquet of
  * the coded relation (8 codes + cell per vector — ~1% of the float
  * bytes), shuffles only probed-cell candidates, and touches full vectors
  * for shortlist×Q rows. Serving cost is independent of build cost.
  */
object AnnIndex {

  /** Build the index from `ctx`'s `embeddings` table and publish under
    * `dir`. `nCells`/`nCodewords` set the coarse/PQ shape (defaults = the
    * [[Similarity.annIvfPq]] verification shape, giving exact parity; a
    * production build passes ~sqrt(N) cells and 256 codewords). Fixed
    * deterministic quantizers: seeds = the nCells lowest vec_ids,
    * codebooks = per-subspace slices of the nCodewords lowest vec_ids —
    * the same rule both engines derive identically (annIvf/annPqRecall).
    * Returns table -> committed version. */
  def build(ctx: Ctx, dir: String, nCells: Int = 8,
      nCodewords: Int = 16): Map[String, Long] = {
    graft.functions.CosineSim.register(ctx.spark)
    val e = ctx.tbl("embeddings")
    val seeds = e.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cell_id"), col("embedding").as("se"))
    val sub = e.select(col("vec_id"), explode(expr("sequence(0, 7)")).as("s"),
        col("embedding"))
      .select(col("vec_id"), col("s"), expr("slice(embedding, s * 8 + 1, 8)").as("sv"))
    val cb = sub.filter(col("vec_id") < nCodewords)
      .select(col("s"), col("vec_id").as("code"), col("sv").as("cv"))
    val assigned = e.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("cell_id"),
        expr("cosine_sim(embedding, se)").as("seed_cos"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("seed_cos").desc, col("cell_id"))))
      .filter(col("rn") === 1)
      .select("vec_id", "cell_id")
    val codes = sub.join(broadcast(cb), Seq("s"))
      .select(col("vec_id"), col("s"), col("code"),
        expr("cosine_sim(sv, cv)").as("subcos"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id", "s").orderBy(col("subcos").desc, col("code"))))
      .filter(col("rn") === 1)
      // pack in subspace order: the vector's production PQ encoding
      .groupBy("vec_id")
      .agg(expr("transform(array_sort(collect_list(struct(s, code))), x -> x.code)")
        .as("codes"))
    val coded = assigned.join(codes, Seq("vec_id"))
      .select("vec_id", "cell_id", "codes")
    Map(
      "seeds" -> Versioned.write(seeds, s"$dir/seeds"),
      "codebooks" -> Versioned.write(cb, s"$dir/codebooks"),
      "coded" -> Versioned.write(coded, s"$dir/coded"),
      "vectors" -> Versioned.write(
        e.select("vec_id", "embedding"), s"$dir/vectors"))
  }

  /** Serve IVFADC top-k from the persisted index: `queries` is
    * (query_id, qe: array<float>). Output schema and every tie-break are
    * identical to [[Similarity.annIvfPq]]'s:
    * (query_id, cand_id, cell_id, approx: double, cosine, rank).
    *
    * This plan keeps the oracle-parity decimal ADC shape (per-subspace
    * rows joined against the query's distance rows — AnnIndexSpec pins
    * bit-identity with the unpersisted composition). At scale the
    * serving-optimal form is the packed-expression ADC measured in
    * [[graft.tools.AnnScaleProbe]] (score = one fold of `subs` array
    * lookups per candidate — the row-per-subspace join machinery made
    * the ADC path lose to brute force, PERF_NOTES_r10.md §3); the
    * `coded` table already stores codes packed for exactly that
    * consumer. */
  def query(spark: SparkSession, dir: String, queries: DataFrame,
      k: Int = 5, nprobe: Int = 2, shortlist: Int = 20): DataFrame = {
    graft.functions.CosineSim.register(spark)
    val seeds = Versioned.read(spark, s"$dir/seeds")
    val cb = Versioned.read(spark, s"$dir/codebooks")
    val coded = Versioned.read(spark, s"$dir/coded")
    val vectors = Versioned.read(spark, s"$dir/vectors")
    val probes = queries.crossJoin(broadcast(seeds))
      .select(col("query_id"), col("cell_id"),
        expr("cosine_sim(qe, se)").as("seed_cos"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("seed_cos").desc, col("cell_id"))))
      .filter(col("rn") <= nprobe)
      .select("query_id", "cell_id")
    val qd = queries
      .select(col("query_id"), explode(expr("sequence(0, 7)")).as("s"), col("qe"))
      .select(col("query_id"), col("s"), expr("slice(qe, s * 8 + 1, 8)").as("qv"))
      .join(broadcast(cb), Seq("s"))
      .select(col("query_id"), col("s"), col("code"),
        round(expr("cosine_sim(qv, cv)"), 9).cast("decimal(12,9)").as("qdec"))
    // candidates = coded vectors in probed cells; their packed codes unpack
    // back to (s, code) rows for the ADC lookup join
    val cands = probes
      .join(coded.select(col("cell_id"), col("vec_id").as("cand_id"),
        col("codes")), Seq("cell_id"))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"), col("cell_id"),
        posexplode(col("codes")).as(Seq("s", "code")))
    val adc = cands
      .join(broadcast(qd), Seq("query_id", "s", "code"))
      .groupBy(col("query_id"), col("cand_id"), col("cell_id"))
      .agg(sum(col("qdec")).as("approx"), count(lit(1)).as("n_sub"))
      .filter(col("n_sub") === 8)
    val short = adc
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("approx").desc, col("cand_id"))))
      .filter(col("rn") <= shortlist)
      .select("query_id", "cand_id", "cell_id", "approx")
    short.join(queries, Seq("query_id"))
      .join(vectors.select(col("vec_id").as("cand_id"), col("embedding").as("ce")),
        Seq("cand_id"))
      .select(col("query_id"), col("cand_id"), col("cell_id"),
        col("approx").cast("double").as("approx"),
        expr("cosine_sim(qe, ce)").as("cosine"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cosine").desc, col("cand_id"))))
      .filter(col("rank") <= k)
  }
}
