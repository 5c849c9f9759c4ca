package graft

import graft.layers._
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import OracleModel.{Entry, e, T, F, oiCols, foiCols}

/** extension-operator oracle entries (dedup / ANN / text / events / corpus
  * pipeline surface) plus their DuckDB dialect helpers — split from
  * Registry.scala, see RegistryModels. */
private[graft] object RegistryExtensions {
  import Oracle.{avgE, d, dump, dv, q, rnd, rndDec, stddevE, sumD}
  import Macros.outD

  private val duckToks =
    "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')"
  private val duckTokCtes =
    s""", r_toks AS (SELECT doc_id, lang, source, text, n_chars, $duckToks AS toks
       |  FROM documents)
       |, r_sh AS (SELECT DISTINCT doc_id, shingle FROM (
       |    SELECT doc_id, unnest(CASE WHEN len(toks) >= 3
       |      THEN list_transform(range(1, len(toks) - 1),
       |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
       |      ELSE [] END) AS shingle
       |    FROM r_toks) u)""".stripMargin
  /** 16 min-hash columns h0..h15 from FOUR md5 digests per shingle (four
    * 8-hex-char slices each) — lockstep twin of extensions.Text.minhash16;
    * see there for the why (the digest pass dominated the SF100 dedup leg). */
  private[graft] val duckSig16Body: String = {
    val mh = (0 until 4).map(j => s"md5('$j|' || shingle)").mkString(" || ")
    s"""SELECT doc_id,
       |    ${(0 until 16).map(i =>
            s"MIN(substring(mh, ${8 * i + 1}, 8)) AS h$i").mkString(",\n    ")}
       |  FROM (SELECT doc_id, $mh AS mh FROM r_sh) GROUP BY 1""".stripMargin
  }
  private val duckSimhashCtes = {
    // 64-bit signature in lockstep with Text.simhashes: bit j votes by bit
    // (j%4) of md5 hex digit (j/4), each bit an IN-list over the digit char
    def inList(j: Int): String =
      extensions.Text.hexBitSets(j % 4).map(d => s"'$d'").mkString(",")
    s""", r_tok2 AS (SELECT doc_id, md5(unnest(toks)) AS h FROM r_toks)
       |, r_votes AS (SELECT doc_id,
       |    ${(0 until 64).map(j =>
          s"CAST(SUM(CASE WHEN substr(h, ${j / 4 + 1}, 1) IN (${inList(j)}) THEN 1 ELSE -1 END) AS BIGINT) AS v$j")
          .mkString(",\n    ")}
       |  FROM r_tok2 GROUP BY 1)
       |, r_simhash AS (SELECT doc_id,
       |    ${(0 until 64).map(j => s"(CASE WHEN v$j >= 0 THEN '1' ELSE '0' END)").mkString(" || ")} AS simhash
       |  FROM r_votes)""".stripMargin
  }

  /** MinHash near-dup pairs (jaccard >= 0.5) -> undirected edges ->
    * recursive transitive closure -> per-doc component minimum. Twin of
    * extensions.Text.dedupClusters' label-propagation fixpoint; requires a
    * WITH RECURSIVE prefix (Oracle.qr). */
  private val duckClusterCtes =
    s""", r_csig AS ($duckSig16Body)
       |, r_cband AS (
       |    SELECT doc_id, 0 AS band_idx, md5(h0 || h1 || h2 || h3) AS band_hash FROM r_csig
       |    UNION ALL SELECT doc_id, 1, md5(h4 || h5 || h6 || h7) FROM r_csig
       |    UNION ALL SELECT doc_id, 2, md5(h8 || h9 || h10 || h11) FROM r_csig
       |    UNION ALL SELECT doc_id, 3, md5(h12 || h13 || h14 || h15) FROM r_csig)
       |, r_ccand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |    FROM r_cband a JOIN r_cband b ON a.band_idx = b.band_idx
       |      AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id)
       |, r_csz AS (SELECT doc_id, COUNT(*) AS set_size FROM r_sh GROUP BY 1)
       |, r_cinter AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS intersection
       |    FROM r_ccand c
       |    JOIN r_sh sa ON sa.doc_id = c.doc_a
       |    JOIN r_sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
       |    GROUP BY 1, 2)
       |, r_nd AS (SELECT i.doc_a, i.doc_b
       |    FROM r_cinter i
       |    JOIN r_csz sa ON i.doc_a = sa.doc_id
       |    JOIN r_csz sb ON i.doc_b = sb.doc_id
       |    WHERE ${dv("i.intersection", "NULLIF(sa.set_size + sb.set_size - i.intersection, 0)")} >= 0.5)
       |, r_und AS (SELECT doc_a AS a, doc_b AS b FROM r_nd
       |    UNION SELECT doc_b, doc_a FROM r_nd)
       |, r_reach AS (
       |    SELECT a AS src, a AS dst FROM (SELECT DISTINCT a FROM r_und) n
       |    UNION
       |    SELECT r.src, e.b FROM r_reach r JOIN r_und e ON r.dst = e.a)
       |, r_comp AS (SELECT src AS doc_id, MIN(dst) AS cluster_id
       |    FROM r_reach GROUP BY 1)""".stripMargin
  private def duckDot(a: String, b: String) = s"list_dot_product($a, $b)"
  private def duckCos(a: String, b: String) =
    s"(${duckDot(a, b)} / (sqrt(${duckDot(a, a)}) * sqrt(${duckDot(b, b)})))"

  // language-ID vote expressions shared by the lang_confusion oracle (same
  // stopword lists as text_language_id)
  private val duckLangPred = {
    val en = "len(list_filter(toks, x -> list_contains(['the','and','of','to','in','is','you','that','it','for'], x)))"
    val de = "len(list_filter(toks, x -> list_contains(['der','die','und','das','ist','nicht','mit','ein','auf','sie'], x)))"
    val fr = "len(list_filter(toks, x -> list_contains(['le','la','les','et','un','une','est','pour','dans','que'], x)))"
    s"CASE WHEN $en >= $de AND $en >= $fr THEN 'en' WHEN $de >= $fr THEN 'de' ELSE 'fr' END"
  }
  // composite quality score shared by the corpus_token_budget oracle (same
  // arithmetic as text_quality)
  private val duckQualityScore = {
    val stopR = dv("len(list_filter(toks, x -> list_contains(['the','and','of','to','in','is','you','that','it','for'], x)))", "NULLIF(len(toks), 0)")
    val punctR = dv("(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))", "NULLIF(length(text), 0)")
    val digitR = dv("(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))", "NULLIF(length(text), 0)")
    s"($stopR * 0.5 + (1 - $punctR) * 0.3 + (1 - $digitR) * 0.2)"
  }

  val models: ListMap[String, Entry] = ListMap(
    "text_token_count" -> e(
      ctx => extensions.Text.tokenCount(ctx).orderBy("doc_id"),
      s"""$duckTokCtes
         |SELECT doc_id, n_chars,
         |  CAST(len(toks) AS INT) AS n_tokens,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]', 0)) AS INT) AS n_bpe_tokens,
         |  ${dv("length(regexp_replace(text, '\\s+', '', 'g'))", "NULLIF(len(toks), 0)")} AS avg_token_len
         |FROM r_toks ORDER BY doc_id""".stripMargin),
    "text_quality" -> e(
      ctx => extensions.Text.quality(ctx).orderBy("doc_id"),
      s"""$duckTokCtes
         |SELECT doc_id, length(text) AS n_chars,
         |  CAST(len(toks) AS INT) AS n_tokens,
         |  ${dv("(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))", "NULLIF(length(text), 0)")} AS punct_ratio,
         |  ${dv("(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))", "NULLIF(length(text), 0)")} AS digit_ratio,
         |  ${dv("(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')))", "NULLIF(length(text), 0)")} AS upper_ratio,
         |  ${dv("len(list_filter(toks, x -> list_contains(['the','and','of','to','in','is','you','that','it','for'], x)))", "NULLIF(len(toks), 0)")} AS stopword_ratio,
         |  (${dv("len(list_filter(toks, x -> list_contains(['the','and','of','to','in','is','you','that','it','for'], x)))", "NULLIF(len(toks), 0)")} * 0.5
         |   + (1 - ${dv("(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))", "NULLIF(length(text), 0)")}) * 0.3
         |   + (1 - ${dv("(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))", "NULLIF(length(text), 0)")}) * 0.2) AS quality_score
         |FROM r_toks ORDER BY doc_id""".stripMargin),
    "text_language_id" -> e(
      ctx => extensions.Text.languageId(ctx).orderBy("doc_id"),
      s"""$duckTokCtes
         |SELECT doc_id, lang AS labeled_lang,
         |  CAST(len(list_filter(toks, x -> list_contains(['the','and','of','to','in','is','you','that','it','for'], x))) AS INT) AS en_hits,
         |  CAST(len(list_filter(toks, x -> list_contains(['der','die','und','das','ist','nicht','mit','ein','auf','sie'], x))) AS INT) AS de_hits,
         |  CAST(len(list_filter(toks, x -> list_contains(['le','la','les','et','un','une','est','pour','dans','que'], x))) AS INT) AS fr_hits,
         |  CASE WHEN len(list_filter(toks, x -> list_contains(['the','and','of','to','in','is','you','that','it','for'], x)))
         |         >= len(list_filter(toks, x -> list_contains(['der','die','und','das','ist','nicht','mit','ein','auf','sie'], x)))
         |        AND len(list_filter(toks, x -> list_contains(['the','and','of','to','in','is','you','that','it','for'], x)))
         |         >= len(list_filter(toks, x -> list_contains(['le','la','les','et','un','une','est','pour','dans','que'], x)))
         |       THEN 'en'
         |       WHEN len(list_filter(toks, x -> list_contains(['der','die','und','das','ist','nicht','mit','ein','auf','sie'], x)))
         |         >= len(list_filter(toks, x -> list_contains(['le','la','les','et','un','une','est','pour','dans','que'], x)))
         |       THEN 'de' ELSE 'fr' END AS predicted_lang
         |FROM r_toks ORDER BY doc_id""".stripMargin),
    "text_fingerprint" -> e(
      ctx => extensions.Text.fingerprint(ctx).orderBy("doc_id"),
      s"""$duckTokCtes
         |, r_fp AS (SELECT doc_id, COUNT(*) AS shingle_count,
         |    MIN(md5(shingle)) AS min_shingle_hash
         |  FROM r_sh GROUP BY 1)
         |SELECT d.doc_id,
         |  md5(regexp_replace(lower(trim(d.text)), '\\s+', ' ', 'g')) AS fingerprint,
         |  COALESCE(f.shingle_count, 0) AS shingle_count,
         |  f.min_shingle_hash
         |FROM documents d LEFT JOIN r_fp f ON d.doc_id = f.doc_id
         |ORDER BY d.doc_id""".stripMargin),
    "lang_confusion" -> e(
      ctx => extensions.Text.langConfusion(ctx)
        .orderBy("labeled_lang", "predicted_lang"),
      s"""$duckTokCtes
         |, r_pred AS (SELECT doc_id, lang AS labeled_lang,
         |    $duckLangPred AS predicted_lang
         |  FROM r_toks)
         |, r_cells AS (SELECT labeled_lang, predicted_lang, COUNT(*) AS n_docs
         |  FROM r_pred GROUP BY 1, 2)
         |SELECT labeled_lang, predicted_lang, n_docs,
         |  ${dv("n_docs", "SUM(n_docs) OVER (PARTITION BY labeled_lang)")} AS labeled_share,
         |  (labeled_lang = predicted_lang) AS is_correct
         |FROM r_cells ORDER BY labeled_lang, predicted_lang""".stripMargin),
    "corpus_token_budget" -> e(
      ctx => extensions.Text.tokenBudget(ctx).orderBy("doc_id"),
      s"""$duckTokCtes
         |, r_q AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         |    $duckQualityScore AS quality_score
         |  FROM r_toks)
         |, r_rank AS (SELECT doc_id, n_tokens, quality_score,
         |    CAST(ROW_NUMBER() OVER (ORDER BY quality_score DESC, doc_id) AS INT) AS quality_rank,
         |    CAST(SUM(n_tokens) OVER (ORDER BY quality_score DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens,
         |    CAST(SUM(n_tokens) OVER () AS BIGINT) AS total_tokens
         |  FROM r_q)
         |SELECT doc_id, n_tokens, quality_score, quality_rank, cum_tokens,
         |  total_tokens, (2 * cum_tokens <= total_tokens) AS selected
         |FROM r_rank ORDER BY doc_id""".stripMargin),
    "source_quality_profile" -> e(
      ctx => extensions.Text.sourceQualityProfile(ctx).orderBy("source"),
      s"""$duckTokCtes
         |, r_sq AS (SELECT doc_id, source, $duckQualityScore AS quality_score
         |  FROM r_toks)
         |SELECT source, COUNT(*) AS n_docs,
         |  ${dv("CAST(SUM(CAST(quality_score AS DECIMAL(38,12))) AS DOUBLE)", "COUNT(*)")} AS avg_quality,
         |  percentile_cont(0.5) WITHIN GROUP (ORDER BY quality_score) AS median_quality,
         |  MIN(quality_score) AS min_quality,
         |  MAX(quality_score) AS max_quality,
         |  ${dv("SUM(CASE WHEN quality_score >= 0.5 THEN 1 ELSE 0 END)", "COUNT(*)")} AS share_above_half
         |FROM r_sq GROUP BY 1 ORDER BY 1""".stripMargin),
    "dedup_exact" -> e(
      ctx => extensions.Text.dedupExact(ctx).orderBy("fingerprint"),
      s"""SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
         |  COUNT(*) AS n_docs, MIN(doc_id) AS keep_doc_id,
         |  COUNT(*) > 1 AS has_duplicates
         |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin),
    "dedup_minhash_lsh" -> e(
      ctx => extensions.Text.dedupMinhashLsh(ctx).orderBy("doc_a", "doc_b"),
      s"""$duckTokCtes
         |, r_sig AS ($duckSig16Body)
         |, r_bandrows AS (
         |    SELECT doc_id, 0 AS band_idx, md5(h0 || h1 || h2 || h3) AS band_hash FROM r_sig
         |    UNION ALL SELECT doc_id, 1, md5(h4 || h5 || h6 || h7) FROM r_sig
         |    UNION ALL SELECT doc_id, 2, md5(h8 || h9 || h10 || h11) FROM r_sig
         |    UNION ALL SELECT doc_id, 3, md5(h12 || h13 || h14 || h15) FROM r_sig)
         |, r_cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |    FROM r_bandrows a
         |    JOIN r_bandrows b ON a.band_idx = b.band_idx
         |      AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id)
         |, r_sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM r_sh GROUP BY 1)
         |, r_inter AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS intersection
         |  FROM r_cand c
         |  JOIN r_sh sa ON sa.doc_id = c.doc_a
         |  JOIN r_sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
         |  GROUP BY 1, 2)
         |SELECT c.doc_a, c.doc_b,
         |  COALESCE(i.intersection, 0) AS intersection,
         |  (sa.set_size + sb.set_size - COALESCE(i.intersection, 0)) AS union_size,
         |  ${dv("COALESCE(i.intersection, 0)", "NULLIF(sa.set_size + sb.set_size - COALESCE(i.intersection, 0), 0)")} AS jaccard,
         |  ${dv("COALESCE(i.intersection, 0)", "NULLIF(sa.set_size + sb.set_size - COALESCE(i.intersection, 0), 0)")} >= 0.5 AS is_near_duplicate
         |FROM r_cand c
         |LEFT JOIN r_inter i ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
         |JOIN r_sizes sa ON c.doc_a = sa.doc_id
         |JOIN r_sizes sb ON c.doc_b = sb.doc_id
         |ORDER BY 1, 2""".stripMargin),
    "dedup_incremental" -> e(
      ctx => extensions.Text.dedupIncremental(ctx).orderBy("doc_id"),
      s"""$duckTokCtes
         |, r_sig AS ($duckSig16Body)
         |, r_bandrows AS (
         |    SELECT doc_id, 0 AS band_idx, md5(h0 || h1 || h2 || h3) AS band_hash FROM r_sig
         |    UNION ALL SELECT doc_id, 1, md5(h4 || h5 || h6 || h7) FROM r_sig
         |    UNION ALL SELECT doc_id, 2, md5(h8 || h9 || h10 || h11) FROM r_sig
         |    UNION ALL SELECT doc_id, 3, md5(h12 || h13 || h14 || h15) FROM r_sig)
         |, r_new AS (SELECT doc_id FROM r_toks
         |    WHERE substr(md5('ibatch|' || CAST(doc_id AS VARCHAR)), 1, 1) < '4')
         |, r_cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |    FROM r_bandrows a
         |    JOIN r_new n ON a.doc_id = n.doc_id
         |    JOIN r_bandrows b ON a.band_idx = b.band_idx
         |      AND a.band_hash = b.band_hash
         |    WHERE b.doc_id NOT IN (SELECT doc_id FROM r_new))
         |, r_sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM r_sh GROUP BY 1)
         |, r_inter AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS intersection
         |  FROM r_cand c
         |  JOIN r_sh sa ON sa.doc_id = c.doc_a
         |  JOIN r_sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
         |  GROUP BY 1, 2)
         |, r_j AS (SELECT c.doc_a, c.doc_b,
         |    ${dv("COALESCE(i.intersection, 0)", "NULLIF(sa.set_size + sb.set_size - COALESCE(i.intersection, 0), 0)")} AS jaccard
         |  FROM r_cand c
         |  LEFT JOIN r_inter i ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
         |  JOIN r_sizes sa ON c.doc_a = sa.doc_id
         |  JOIN r_sizes sb ON c.doc_b = sb.doc_id)
         |, r_per AS (SELECT doc_a,
         |    COUNT(*) AS n_candidates,
         |    SUM(CASE WHEN jaccard >= 0.5 THEN 1 ELSE 0 END) AS n_dups,
         |    MAX(jaccard) AS max_jaccard,
         |    MIN(CASE WHEN jaccard >= 0.5 THEN doc_b END) AS dup_witness
         |  FROM r_j GROUP BY 1)
         |SELECT n.doc_id,
         |  COALESCE(p.n_candidates, 0) AS n_candidates,
         |  CAST(COALESCE(p.n_dups, 0) AS BIGINT) AS n_dups,
         |  p.max_jaccard, p.dup_witness,
         |  COALESCE(p.n_dups, 0) = 0 AS keep
         |FROM r_new n
         |LEFT JOIN r_per p ON n.doc_id = p.doc_a
         |ORDER BY n.doc_id""".stripMargin),
    "dedup_clusters" -> Entry(
      ctx => extensions.Text.dedupClusters(ctx).orderBy("doc_id"),
      Some(Oracle.qr(
        s"""$duckTokCtes
           |$duckClusterCtes
           |, r_cs AS (SELECT cluster_id, COUNT(*) AS cluster_size
           |    FROM r_comp GROUP BY 1)
           |SELECT c.doc_id, c.cluster_id, s.cluster_size,
           |  c.doc_id = c.cluster_id AS is_cluster_keeper
           |FROM r_comp c JOIN r_cs s USING (cluster_id)
           |ORDER BY c.doc_id""".stripMargin))),
    "corpus_selection" -> Entry(
      ctx => extensions.Text.corpusSelection(ctx).orderBy("doc_id"),
      Some(Oracle.qr(
        s"""$duckTokCtes
           |$duckClusterCtes
           |, r_cq AS (SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens,
           |    (${dv("len(list_filter(toks, x -> list_contains(['the','and','of','to','in','is','you','that','it','for'], x)))", "NULLIF(len(toks), 0)")} * 0.5
           |     + (1 - ${dv("(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))", "NULLIF(length(text), 0)")}) * 0.3
           |     + (1 - ${dv("(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))", "NULLIF(length(text), 0)")}) * 0.2) AS quality_score
           |  FROM r_toks)
           |, r_clid AS (SELECT doc_id, lang AS labeled_lang,
           |    CASE WHEN len(list_filter(toks, x -> list_contains(['the','and','of','to','in','is','you','that','it','for'], x)))
           |           >= len(list_filter(toks, x -> list_contains(['der','die','und','das','ist','nicht','mit','ein','auf','sie'], x)))
           |          AND len(list_filter(toks, x -> list_contains(['the','and','of','to','in','is','you','that','it','for'], x)))
           |           >= len(list_filter(toks, x -> list_contains(['le','la','les','et','un','une','est','pour','dans','que'], x)))
           |         THEN 'en'
           |         WHEN len(list_filter(toks, x -> list_contains(['der','die','und','das','ist','nicht','mit','ein','auf','sie'], x)))
           |           >= len(list_filter(toks, x -> list_contains(['le','la','les','et','un','une','est','pour','dans','que'], x)))
           |         THEN 'de' ELSE 'fr' END AS predicted_lang
           |  FROM r_toks)
           |, r_cfp AS (SELECT doc_id,
           |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
           |  FROM documents)
           |, r_ckeep AS (SELECT fp, MIN(doc_id) AS keep FROM r_cfp GROUP BY 1)
           |, r_exact_drop AS (SELECT f.doc_id FROM r_cfp f
           |    JOIN r_ckeep k ON f.fp = k.fp AND f.doc_id <> k.keep)
           |, r_near_drop AS (SELECT doc_id FROM r_comp WHERE doc_id <> cluster_id)
           |SELECT d.doc_id, d.source, d.lang, d.n_chars,
           |  q.n_tokens, q.quality_score, l.predicted_lang
           |FROM documents d
           |JOIN r_cq q USING (doc_id)
           |JOIN r_clid l USING (doc_id)
           |WHERE q.quality_score >= 0.5 AND q.n_tokens >= 10
           |  AND l.predicted_lang = l.labeled_lang
           |  AND d.doc_id NOT IN (SELECT doc_id FROM r_exact_drop)
           |  AND d.doc_id NOT IN (SELECT doc_id FROM r_near_drop)
           |ORDER BY d.doc_id""".stripMargin))),
    "dedup_simhash" -> e(
      ctx => extensions.Text.dedupSimhash(ctx).orderBy("doc_id"),
      s"""$duckTokCtes
         |$duckSimhashCtes
         |SELECT s.doc_id, s.simhash, g.bucket_size, g.bucket_keep_doc_id
         |FROM r_simhash s
         |JOIN (SELECT simhash, COUNT(*) AS bucket_size, MIN(doc_id) AS bucket_keep_doc_id
         |      FROM r_simhash GROUP BY 1) g USING (simhash)
         |ORDER BY s.doc_id""".stripMargin),
    "dedup_simhash_near" -> e(
      ctx => extensions.Text.dedupSimhashNear(ctx).orderBy("doc_a", "doc_b"),
      s"""$duckTokCtes
         |$duckSimhashCtes
         |, r_chunks AS (
         |    SELECT doc_id, simhash, 0 AS chunk_idx, substr(simhash, 1, 22) AS chunk_val FROM r_simhash
         |    UNION ALL SELECT doc_id, simhash, 1, substr(simhash, 23, 21) FROM r_simhash
         |    UNION ALL SELECT doc_id, simhash, 2, substr(simhash, 44, 21) FROM r_simhash)
         |, r_hcand AS (SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sim_a,
         |    b.doc_id AS doc_b, b.simhash AS sim_b
         |  FROM r_chunks a
         |  JOIN r_chunks b ON a.chunk_idx = b.chunk_idx
         |    AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, sim_a AS simhash_a, sim_b AS simhash_b,
         |  CAST(len(list_filter(range(1, 65), i -> substr(sim_a, i, 1) <> substr(sim_b, i, 1))) AS INT) AS hamming
         |FROM r_hcand
         |WHERE len(list_filter(range(1, 65), i -> substr(sim_a, i, 1) <> substr(sim_b, i, 1))) <= 2
         |ORDER BY doc_a, doc_b""".stripMargin),
    "dedup_simhash_stats" -> e(
      ctx => extensions.Text.dedupSimhashStats(ctx).orderBy("hamming"),
      s"""$duckTokCtes
         |$duckSimhashCtes
         |, r_chunks AS (
         |    SELECT doc_id, simhash, 0 AS chunk_idx, substr(simhash, 1, 22) AS chunk_val FROM r_simhash
         |    UNION ALL SELECT doc_id, simhash, 1, substr(simhash, 23, 21) FROM r_simhash
         |    UNION ALL SELECT doc_id, simhash, 2, substr(simhash, 44, 21) FROM r_simhash)
         |, r_hcand AS (SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sim_a,
         |    b.doc_id AS doc_b, b.simhash AS sim_b
         |  FROM r_chunks a
         |  JOIN r_chunks b ON a.chunk_idx = b.chunk_idx
         |    AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id)
         |, r_pairs AS (SELECT doc_a, doc_b,
         |    CAST(len(list_filter(range(1, 65), i -> substr(sim_a, i, 1) <> substr(sim_b, i, 1))) AS INT) AS hamming
         |  FROM r_hcand
         |  WHERE len(list_filter(range(1, 65), i -> substr(sim_a, i, 1) <> substr(sim_b, i, 1))) <= 2)
         |, r_pdocs AS (SELECT hamming, unnest([doc_a, doc_b]) AS doc_id FROM r_pairs)
         |SELECT hamming, CAST(COUNT(*) // 2 AS BIGINT) AS n_pairs,
         |  COUNT(DISTINCT doc_id) AS n_docs
         |FROM r_pdocs GROUP BY 1 ORDER BY hamming""".stripMargin),
    "dedup_ngram_jaccard" -> e(
      ctx => extensions.Text.dedupNgramJaccard(ctx).orderBy("doc_a", "doc_b"),
      s"""$duckTokCtes
         |, r_shs AS (SELECT s.doc_id, s.shingle, d.source
         |  FROM r_sh s JOIN documents d USING (doc_id))
         |, r_sz AS (SELECT doc_id, COUNT(*) AS set_size FROM r_sh GROUP BY 1)
         |, r_nsig AS (SELECT doc_id, source,
         |    ${(0 until 8).map(i => s"MIN(md5('$i|' || shingle)) AS h$i").mkString(",\n    ")}
         |  FROM r_shs GROUP BY 1, 2)
         |, r_nband AS (
         |    ${(0 until 8).map(i =>
              s"SELECT doc_id, source, $i AS band_idx, h$i AS band_hash FROM r_nsig")
              .mkString("\n    UNION ALL ")})
         |, r_ncand AS (SELECT DISTINCT a.source, a.doc_id AS doc_a, b.doc_id AS doc_b
         |    FROM r_nband a
         |    JOIN r_nband b ON a.source = b.source AND a.band_idx = b.band_idx
         |      AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id)
         |, r_ninter AS (SELECT c.source, c.doc_a, c.doc_b, COUNT(*) AS intersection
         |  FROM r_ncand c
         |  JOIN r_sh sa ON sa.doc_id = c.doc_a
         |  JOIN r_sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
         |  GROUP BY 1, 2, 3)
         |SELECT * FROM (
         |  SELECT p.source, p.doc_a, p.doc_b, p.intersection,
         |    (sa.set_size + sb.set_size - p.intersection) AS union_size,
         |    ${dv("p.intersection", "NULLIF(sa.set_size + sb.set_size - p.intersection, 0)")} AS jaccard
         |  FROM r_ninter p
         |  JOIN r_sz sa ON p.doc_a = sa.doc_id
         |  JOIN r_sz sb ON p.doc_b = sb.doc_id) x
         |WHERE jaccard >= 0.1
         |ORDER BY doc_a, doc_b""".stripMargin),
    "ann_brute_force" -> e(
      ctx => extensions.Similarity.annBruteForce(ctx).orderBy("query_id", "rank"),
      s""", r_emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ed FROM embeddings)
         |SELECT query_id, cand_id, cosine, CAST(rn AS INT) AS rank FROM (
         |  SELECT query_id, cand_id, cosine,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rn
         |  FROM (SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
         |          ${duckCos("a.ed", "b.ed")} AS cosine
         |        FROM r_emb a JOIN r_emb b ON a.vec_id < 10 AND a.vec_id != b.vec_id) y) x
         |WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin),
    "ann_lsh_buckets" -> e(
      ctx => extensions.Similarity.annLshBuckets(ctx).orderBy("vec_a", "vec_b"),
      s""", r_emb2 AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ed,
         |    ${(0 until 8).map(j =>
              s"(CASE WHEN list_sum(list_transform(range(0, len(embedding)), i -> CAST(embedding[i+1] AS DOUBLE) * CAST((i * 31 + $j * 17) % 7 - 3 AS DOUBLE))) >= 0 THEN '1' ELSE '0' END)")
              .mkString(" || ")} AS bucket
         |  FROM embeddings)
         |SELECT * FROM (
         |  SELECT a.bucket, a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    a.label AS label_a, b.label AS label_b,
         |    ${duckCos("a.ed", "b.ed")} AS cosine,
         |    a.label = b.label AS same_label
         |  FROM r_emb2 a JOIN r_emb2 b ON a.bucket = b.bucket AND a.vec_id < b.vec_id) x
         |WHERE cosine >= 0.3 ORDER BY vec_a, vec_b""".stripMargin),
    "dedup_embedding" -> e(
      ctx => extensions.Similarity.dedupEmbedding(ctx).orderBy("vec_a", "vec_b"),
      s""", r_emb2 AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ed,
         |    ${(0 until 8).map(j =>
              s"(CASE WHEN list_sum(list_transform(range(0, len(embedding)), i -> CAST(embedding[i+1] AS DOUBLE) * CAST((i * 31 + $j * 17) % 7 - 3 AS DOUBLE))) >= 0 THEN '1' ELSE '0' END)")
              .mkString(" || ")} AS bucket
         |  FROM embeddings)
         |SELECT vec_a, vec_b, cosine FROM (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, ${duckCos("a.ed", "b.ed")} AS cosine
         |  FROM r_emb2 a JOIN r_emb2 b ON a.bucket = b.bucket AND a.vec_id < b.vec_id) x
         |WHERE cosine >= 0.4 ORDER BY vec_a, vec_b""".stripMargin),
    // semanticDedupPipeline is EAGER by nature (an index BUILD is actions:
    // the Versioned publishes) — fine here because the driver times
    // fn(spark, dir) inclusively. The oracle mirrors the whole pipeline's
    // math: ceil(sqrt(N)) coarse cells (vec_id is 1-based), nearest-seed
    // assignment with the (cosine DESC, cell_id) tie-break, within-cell
    // pairs, SemDeDup's drop-if-any-lower-id-mate-reaches-tau rule.
    "dedup_semantic" -> e(
      ctx => extensions.AnnIndex.semanticDedupPipeline(ctx).orderBy("vec_id"),
      s""", r_sd_emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ed FROM embeddings)
         |, r_sd_seeds AS (SELECT vec_id AS cell_id, ed AS se FROM r_sd_emb
         |    WHERE vec_id < (SELECT CAST(CEIL(SQRT(COUNT(*))) AS BIGINT) FROM embeddings))
         |, r_sd_assigned AS (SELECT vec_id, cell_id, ed FROM (
         |    SELECT v.vec_id, s.cell_id, v.ed,
         |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
         |        ORDER BY ${duckCos("v.ed", "s.se")} DESC, s.cell_id) AS rn
         |    FROM r_sd_emb v CROSS JOIN r_sd_seeds s) x WHERE rn = 1)
         |, r_sd_pairs AS (SELECT a.vec_id AS vec_lo, b.vec_id AS vec_hi,
         |    ${duckCos("a.ed", "b.ed")} AS cosine
         |  FROM r_sd_assigned a JOIN r_sd_assigned b
         |    ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id)
         |, r_sd_roll AS (SELECT vec_hi AS vec_id,
         |    MAX(cosine) AS max_cosine_lower,
         |    COUNT(CASE WHEN cosine >= 0.4 THEN 1 END) AS n_dup_lower,
         |    MIN(CASE WHEN cosine >= 0.4 THEN vec_lo END) AS dup_witness
         |  FROM r_sd_pairs GROUP BY 1)
         |SELECT a.vec_id, a.cell_id,
         |  COALESCE(r.n_dup_lower, 0) AS n_dup_lower,
         |  r.dup_witness, r.max_cosine_lower,
         |  COALESCE(r.n_dup_lower, 0) = 0 AS keep
         |FROM r_sd_assigned a LEFT JOIN r_sd_roll r ON a.vec_id = r.vec_id
         |ORDER BY a.vec_id""".stripMargin),
    "ann_ivf" -> e(
      ctx => extensions.Similarity.annIvf(ctx).orderBy("query_id", "rank"),
      s""", r_emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ed FROM embeddings)
         |, r_seeds AS (SELECT vec_id AS cell_id, ed AS se FROM r_emb WHERE vec_id < 8)
         |, r_assigned AS (SELECT vec_id, ed, cell_id FROM (
         |    SELECT v.vec_id, v.ed, s.cell_id,
         |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
         |        ORDER BY ${duckCos("v.ed", "s.se")} DESC, s.cell_id) AS rn
         |    FROM r_emb v CROSS JOIN r_seeds s) x WHERE rn = 1)
         |, r_probes AS (SELECT query_id, qe, cell_id FROM (
         |    SELECT q.vec_id AS query_id, q.ed AS qe, s.cell_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${duckCos("q.ed", "s.se")} DESC, s.cell_id) AS rn
         |    FROM r_emb q CROSS JOIN r_seeds s
         |    WHERE q.vec_id >= 10 AND q.vec_id < 20) x WHERE rn <= 2)
         |SELECT query_id, cand_id, cell_id, cosine, CAST(rn2 AS INT) AS rank FROM (
         |  SELECT query_id, cand_id, cell_id, cosine,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rn2
         |  FROM (SELECT p.query_id, a.vec_id AS cand_id, p.cell_id,
         |          ${duckCos("p.qe", "a.ed")} AS cosine
         |        FROM r_probes p
         |        JOIN r_assigned a ON p.cell_id = a.cell_id AND p.query_id != a.vec_id) z) y
         |WHERE rn2 <= 3 ORDER BY query_id, rank""".stripMargin),
    "embedding_quantize" -> e(
      ctx => extensions.Similarity.embeddingQuantize(ctx).orderBy("vec_id", "idx"),
      """, r_qe AS (SELECT vec_id, idx, CAST(embedding[idx + 1] AS DOUBLE) AS vd
        |    FROM (SELECT vec_id, embedding, UNNEST(range(len(embedding))) AS idx
        |          FROM embeddings))
        |, r_qs AS (SELECT idx, MIN(vd) AS dmin, MAX(vd) AS dmax FROM r_qe GROUP BY 1)
        |SELECT e.vec_id, CAST(e.idx AS INT) AS idx, s.dmin, s.dmax,
        |  CAST(ROUND((e.vd - s.dmin) * 255 / NULLIF(s.dmax - s.dmin, 0), 0) AS INT) AS q
        |FROM r_qe e JOIN r_qs s ON e.idx = s.idx
        |ORDER BY vec_id, idx""".stripMargin),
    "ann_quantized_recall" -> e(
      ctx => extensions.Similarity.annQuantizedRecall(ctx).orderBy("query_id"),
      s""", r_emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ed FROM embeddings)
         |, r_qre AS (SELECT vec_id, idx, CAST(embedding[idx + 1] AS DOUBLE) AS vd
         |    FROM (SELECT vec_id, embedding, UNNEST(range(len(embedding))) AS idx
         |          FROM embeddings))
         |, r_qrs AS (SELECT idx, MIN(vd) AS dmin, MAX(vd) AS dmax FROM r_qre GROUP BY 1)
         |, r_qrr AS (SELECT e.vec_id, e.idx,
         |    CASE WHEN s.dmax = s.dmin THEN s.dmin
         |      ELSE s.dmin + ROUND((e.vd - s.dmin) * 255 / (s.dmax - s.dmin), 0)
         |        * (s.dmax - s.dmin) / 255 END AS rd
         |  FROM r_qre e JOIN r_qrs s ON e.idx = s.idx)
         |, r_qrv AS (SELECT vec_id, list(rd ORDER BY idx) AS rv FROM r_qrr GROUP BY 1)
         |, r_qx AS (SELECT query_id, cand_id FROM (
         |    SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
         |      ROW_NUMBER() OVER (PARTITION BY a.vec_id
         |        ORDER BY ${duckCos("a.ed", "b.ed")} DESC, b.vec_id) AS rn
         |    FROM r_emb a JOIN r_emb b ON a.vec_id < 10 AND a.vec_id != b.vec_id) x
         |  WHERE rn <= 5)
         |, r_qv AS (SELECT query_id, cand_id FROM (
         |    SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
         |      ROW_NUMBER() OVER (PARTITION BY a.vec_id
         |        ORDER BY ${duckCos("a.rv", "b.rv")} DESC, b.vec_id) AS rn
         |    FROM r_qrv a JOIN r_qrv b ON a.vec_id < 10 AND a.vec_id != b.vec_id) x
         |  WHERE rn <= 5)
         |SELECT e.query_id, COUNT(e.cand_id) AS n_exact, COUNT(q.cand_id) AS n_overlap,
         |  ${dv("COUNT(q.cand_id)", "COUNT(e.cand_id)")} AS recall_at_k
         |FROM r_qx e LEFT JOIN r_qv q
         |  ON e.query_id = q.query_id AND e.cand_id = q.cand_id
         |GROUP BY 1 ORDER BY 1""".stripMargin),
    "training_pairs" -> e(
      ctx => extensions.Similarity.trainingPairs(ctx),
      s""", r_tp AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ed,
         |    ROW_NUMBER() OVER (ORDER BY label, vec_id) AS rn,
         |    COUNT(*) OVER () AS total
         |  FROM embeddings)
         |, r_tp_pos AS (SELECT TRUE AS is_positive, a.vec_id AS vec_a,
         |    b.vec_id AS vec_b, a.label AS label_a, b.label AS label_b,
         |    ${duckCos("a.ed", "b.ed")} AS cosine
         |  FROM r_tp a JOIN r_tp b ON b.rn = a.rn + 1 AND a.label = b.label)
         |, r_tp_neg AS (SELECT FALSE AS is_positive, a.vec_id AS vec_a,
         |    b.vec_id AS vec_b, a.label AS label_a, b.label AS label_b,
         |    ${duckCos("a.ed", "b.ed")} AS cosine
         |  FROM r_tp a JOIN r_tp b
         |    ON b.rn = ((a.rn - 1 + a.total // 2) % a.total) + 1
         |    AND a.label <> b.label)
         |SELECT * FROM r_tp_pos UNION ALL SELECT * FROM r_tp_neg
         |ORDER BY is_positive DESC, vec_a, vec_b""".stripMargin),
    "ann_lsh_buckets_wide" -> e(
      ctx => extensions.Similarity.annLshBucketsWide(ctx).orderBy("vec_a", "vec_b"),
      // occupancy-adaptive grid: 24-bit / mod-23 signature truncated to
      // b = clamp(8..24, ceil(log2(N/16))) — the same formula the Spark
      // side computes, so the gate verifies the adaptive re-grid itself
      s""", r_embw_all AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ed,
         |    substr(${(0 until 24).map(j =>
              s"(CASE WHEN list_sum(list_transform(range(0, len(embedding)), i -> CAST(embedding[i+1] AS DOUBLE) * CAST((i * 31 + $j * 17) % 23 - 11 AS DOUBLE))) >= 0 THEN '1' ELSE '0' END)")
              .mkString(" || ")}, 1,
         |      (SELECT GREATEST(8, LEAST(24, CAST(CEIL(LOG2(COUNT(*) / 16.0)) AS INT)))
         |       FROM embeddings)) AS bucket
         |  FROM embeddings)
         |, r_embw AS (SELECT vec_id, label, ed, bucket FROM (
         |    SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY vec_id) AS rn
         |    FROM r_embw_all) WHERE rn <= 128)
         |SELECT * FROM (
         |  SELECT a.bucket, a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    a.label AS label_a, b.label AS label_b,
         |    ${duckCos("a.ed", "b.ed")} AS cosine,
         |    a.label = b.label AS same_label
         |  FROM r_embw a JOIN r_embw b ON a.bucket = b.bucket AND a.vec_id < b.vec_id) x
         |WHERE cosine >= 0.3 ORDER BY vec_a, vec_b""".stripMargin),
    "ann_pq_recall" -> e(
      ctx => extensions.Similarity.annPqRecall(ctx),
      s""", r_pq_sub AS (SELECT vec_id, s, list_slice(ed, s*8+1, s*8+8) AS sv FROM
         |    (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ed, UNNEST(range(8)) AS s
         |     FROM embeddings))
         |, r_pq_cb AS (SELECT s, vec_id AS cell, sv AS cv FROM r_pq_sub WHERE vec_id < 16)
         |, r_pq_codes AS (SELECT vec_id, s, cell FROM (
         |    SELECT v.vec_id, v.s, c.cell,
         |      ROW_NUMBER() OVER (PARTITION BY v.vec_id, v.s
         |        ORDER BY ${duckCos("v.sv", "c.cv")} DESC, c.cell) AS rn
         |    FROM r_pq_sub v JOIN r_pq_cb c ON v.s = c.s) x WHERE rn = 1)
         |, r_pq_qd AS (SELECT q.vec_id AS query_id, q.s, c.cell,
         |    CAST(ROUND(${duckCos("q.sv", "c.cv")}, 9) AS DECIMAL(12,9)) AS qdec
         |  FROM r_pq_sub q JOIN r_pq_cb c ON q.s = c.s
         |  WHERE q.vec_id >= 10 AND q.vec_id < 20)
         |, r_pq_adc AS (SELECT qd.query_id, co.vec_id AS cand_id, SUM(qd.qdec) AS approx
         |    FROM r_pq_codes co JOIN r_pq_qd qd ON co.s = qd.s AND co.cell = qd.cell
         |    WHERE qd.query_id != co.vec_id
         |    GROUP BY 1, 2 HAVING COUNT(*) = 8)
         |, r_pq_top AS (SELECT query_id, cand_id FROM (
         |    SELECT query_id, cand_id, ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY approx DESC, cand_id) AS rn FROM r_pq_adc) x WHERE rn <= 5)
         |, r_pq_emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ed FROM embeddings)
         |, r_pq_ex AS (SELECT query_id, cand_id FROM (
         |    SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
         |      ROW_NUMBER() OVER (PARTITION BY a.vec_id
         |        ORDER BY ${duckCos("a.ed", "b.ed")} DESC, b.vec_id) AS rn
         |    FROM r_pq_emb a JOIN r_pq_emb b
         |      ON a.vec_id >= 10 AND a.vec_id < 20 AND a.vec_id != b.vec_id) x
         |  WHERE rn <= 5)
         |SELECT e.query_id, COUNT(e.cand_id) AS n_exact, COUNT(p.cand_id) AS n_overlap,
         |  ${dv("COUNT(p.cand_id)", "COUNT(e.cand_id)")} AS recall_at_k
         |FROM r_pq_ex e LEFT JOIN r_pq_top p
         |  ON e.query_id = p.query_id AND e.cand_id = p.cand_id
         |GROUP BY 1 ORDER BY 1""".stripMargin),
    "ann_ivf_pq" -> e(
      ctx => extensions.Similarity.annIvfPq(ctx).orderBy("query_id", "rank"),
      s""", r_ip_emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ed FROM embeddings)
         |, r_ip_seeds AS (SELECT vec_id AS cell_id, ed AS se FROM r_ip_emb WHERE vec_id < 8)
         |, r_ip_assigned AS (SELECT vec_id, cell_id FROM (
         |    SELECT v.vec_id, s.cell_id,
         |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
         |        ORDER BY ${duckCos("v.ed", "s.se")} DESC, s.cell_id) AS rn
         |    FROM r_ip_emb v CROSS JOIN r_ip_seeds s) x WHERE rn = 1)
         |, r_ip_probes AS (SELECT query_id, cell_id FROM (
         |    SELECT q.vec_id AS query_id, s.cell_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${duckCos("q.ed", "s.se")} DESC, s.cell_id) AS rn
         |    FROM r_ip_emb q CROSS JOIN r_ip_seeds s
         |    WHERE q.vec_id >= 10 AND q.vec_id < 20) x WHERE rn <= 2)
         |, r_ip_sub AS (SELECT vec_id, s, list_slice(ed, s*8+1, s*8+8) AS sv
         |    FROM (SELECT vec_id, ed, UNNEST(range(8)) AS s FROM r_ip_emb))
         |, r_ip_cb AS (SELECT s, vec_id AS code, sv AS cv FROM r_ip_sub WHERE vec_id < 16)
         |, r_ip_codes AS (SELECT vec_id AS cand_id, s, code FROM (
         |    SELECT v.vec_id, v.s, c.code,
         |      ROW_NUMBER() OVER (PARTITION BY v.vec_id, v.s
         |        ORDER BY ${duckCos("v.sv", "c.cv")} DESC, c.code) AS rn
         |    FROM r_ip_sub v JOIN r_ip_cb c ON v.s = c.s) x WHERE rn = 1)
         |, r_ip_qd AS (SELECT q.vec_id AS query_id, q.s, c.code,
         |    CAST(ROUND(${duckCos("q.sv", "c.cv")}, 9) AS DECIMAL(12,9)) AS qdec
         |  FROM r_ip_sub q JOIN r_ip_cb c ON q.s = c.s
         |  WHERE q.vec_id >= 10 AND q.vec_id < 20)
         |, r_ip_cand AS (SELECT p.query_id, a.vec_id AS cand_id, p.cell_id
         |    FROM r_ip_probes p JOIN r_ip_assigned a ON p.cell_id = a.cell_id
         |    WHERE p.query_id != a.vec_id)
         |, r_ip_adc AS (SELECT c.query_id, c.cand_id, c.cell_id,
         |      SUM(qd.qdec) AS approx
         |    FROM r_ip_cand c
         |    JOIN r_ip_codes co ON co.cand_id = c.cand_id
         |    JOIN r_ip_qd qd ON qd.query_id = c.query_id
         |      AND qd.s = co.s AND qd.code = co.code
         |    GROUP BY 1, 2, 3 HAVING COUNT(*) = 8)
         |, r_ip_short AS (SELECT query_id, cand_id, cell_id, approx FROM (
         |    SELECT query_id, cand_id, cell_id, approx,
         |      ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY approx DESC, cand_id) AS rn FROM r_ip_adc) x WHERE rn <= 20)
         |SELECT query_id, cand_id, cell_id, approx, cosine, CAST(rn2 AS INT) AS rank
         |FROM (
         |  SELECT s.query_id, s.cand_id, s.cell_id,
         |    CAST(s.approx AS DOUBLE) AS approx,
         |    ${duckCos("q.ed", "c.ed")} AS cosine,
         |    ROW_NUMBER() OVER (PARTITION BY s.query_id
         |      ORDER BY ${duckCos("q.ed", "c.ed")} DESC, s.cand_id) AS rn2
         |  FROM r_ip_short s
         |  JOIN r_ip_emb q ON q.vec_id = s.query_id
         |  JOIN r_ip_emb c ON c.vec_id = s.cand_id) y
         |WHERE rn2 <= 5 ORDER BY query_id, rank""".stripMargin),
    "label_centroids" -> e(
      ctx => extensions.Similarity.labelCentroids(ctx).orderBy("label", "idx"),
      """SELECT label, CAST(idx AS INT) AS idx, COUNT(*) AS n_vectors,
        |  ((CAST(SUM(vd) AS DOUBLE) / COUNT(*)) / 1e9) AS dim_mean
        |FROM (SELECT label, idx,
        |        CAST(round(CAST(embedding[idx + 1] AS DOUBLE) * 1e9, 0) AS DECIMAL(20,0)) AS vd
        |      FROM (SELECT label, embedding, UNNEST(range(len(embedding))) AS idx
        |            FROM embeddings))
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    "events_json_extract" -> e(
      ctx => extensions.Events.jsonExtract(ctx).orderBy("event_id"),
      """SELECT event_id, event_type,
        |  CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INT) AS k,
        |  value
        |FROM events ORDER BY event_id""".stripMargin),
    "events_hourly_by_type" -> e(
      ctx => extensions.Events.hourlyByType(ctx).orderBy("hour_epoch", "event_type"),
      s"""SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_epoch,
         |  event_type,
         |  COUNT(*) AS n_events,
         |  COUNT(DISTINCT user_id) AS unique_users,
         |  ${sumD("CAST(value AS DECIMAL(18,6))")} AS total_value,
         |  ${avgE("CAST(value AS DECIMAL(18,6))")} AS avg_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    "events_sessionize" -> e(
      ctx => extensions.Events.sessionize(ctx).orderBy("user_id", "session_idx"),
      s""", r_ev AS (SELECT user_id, event_id,
         |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
         |    CAST(value AS DECIMAL(18,6)) AS value_d
         |  FROM events)
         |, r_flag AS (SELECT *, CASE WHEN LAG(ts_sec) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) IS NULL
         |      OR ts_sec - LAG(ts_sec) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) > 1800
         |    THEN 1 ELSE 0 END AS is_new
         |  FROM r_ev)
         |, r_sess AS (SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
         |  FROM r_flag)
         |SELECT user_id, session_idx, COUNT(*) AS n_events,
         |  MIN(ts_sec) AS session_start_epoch,
         |  MAX(ts_sec) AS session_end_epoch,
         |  MAX(ts_sec) - MIN(ts_sec) AS duration_seconds,
         |  ${sumD("value_d")} AS session_value
         |FROM r_sess GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    "events_daily_funnel" -> e(
      ctx => extensions.Events.dailyFunnel(ctx).orderBy("day_epoch"),
      s"""SELECT CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_epoch,
         |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
         |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
         |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
         |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors,
         |  COUNT(DISTINCT user_id) AS active_users,
         |  ${dv("SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)", "NULLIF(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END), 0)")} AS click_through_rate,
         |  ${dv("SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)", "NULLIF(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END), 0)")} AS purchase_conversion_rate
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
    "events_dedup" -> e(
      ctx => extensions.Events.dedupEvents(ctx)
        .orderBy("user_id", "event_type", "minute_epoch"),
      """SELECT user_id, event_type,
        |  -- integer nanosecond path: DuckDB's // on DOUBLE is plain division,
        |  -- so the epoch()-based form would mis-bucket; epoch_ns is BIGINT
        |  CAST(epoch_ns(ts) // 1000000000 // 60 * 60 AS BIGINT) AS minute_epoch,
        |  COUNT(*) AS occurrences,
        |  MIN(event_id) AS keep_event_id,
        |  CAST(MIN(epoch_ns(ts) // 1000000000) AS BIGINT) AS first_seen_epoch
        |FROM events GROUP BY 1, 2, 3 HAVING COUNT(*) > 1
        |ORDER BY 1, 2, 3""".stripMargin),
    "corpus_split" -> e(
      ctx => extensions.Text.corpusSplit(ctx).orderBy("doc_id"),
      """SELECT doc_id, source, lang, n_chars,
        |  substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 2) AS split_hash,
        |  CASE WHEN substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 2) <= 'bf' THEN 'train'
        |       WHEN substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 2) <= 'df' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin),
    "corpus_mix" -> e(
      ctx => extensions.Text.corpusMix(ctx).orderBy("source", "sample_rank"),
      """SELECT doc_id, source, lang, n_chars,
        |  CAST(rn AS INT) AS sample_rank, n_source_docs
        |FROM (SELECT doc_id, source, lang, n_chars,
        |        ROW_NUMBER() OVER (PARTITION BY source
        |          ORDER BY md5('mix|' || CAST(doc_id AS VARCHAR)), doc_id) AS rn,
        |        COUNT(*) OVER (PARTITION BY source) AS n_source_docs
        |      FROM documents) x WHERE rn <= 10
        |ORDER BY source, sample_rank""".stripMargin),
    "corpus_shard_manifest" -> e(
      ctx => extensions.Text.corpusShardManifest(ctx).orderBy("shard_id"),
      s"""$duckTokCtes
         |, r_doc AS (SELECT doc_id, n_chars, len(toks) AS n_toks,
         |    substr(md5('shard|' || CAST(doc_id AS VARCHAR)), 1, 1) AS shard_hex
         |  FROM r_toks)
         |, r_m AS (SELECT shard_hex,
         |    COUNT(*) AS n_docs,
         |    SUM(n_toks) AS n_tokens,
         |    SUM(n_chars) AS n_chars_total,
         |    MIN(doc_id) AS min_doc_id,
         |    MAX(doc_id) AS max_doc_id
         |  FROM r_doc GROUP BY 1)
         |, r_tot AS (SELECT COUNT(*) AS total_docs FROM documents)
         |SELECT CAST(instr('0123456789abcdef', shard_hex) - 1 AS INT) AS shard_id,
         |  shard_hex, n_docs,
         |  CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST(n_chars_total AS BIGINT) AS n_chars_total,
         |  min_doc_id, max_doc_id,
         |  ${dv("n_docs * 16", "NULLIF(total_docs, 0)")} AS balance_ratio
         |FROM r_m, r_tot
         |ORDER BY shard_id""".stripMargin),
    "corpus_decontaminate" -> e(
      ctx => extensions.Text.decontaminate(ctx).orderBy("doc_id"),
      s"""$duckTokCtes
         |, r_dsp AS (SELECT doc_id,
         |    CASE WHEN substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 2) <= 'bf' THEN 'train'
         |         WHEN substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 2) <= 'df' THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM documents)
         |, r_dtag AS (SELECT s.doc_id, s.shingle, p.split
         |    FROM r_sh s JOIN r_dsp p ON s.doc_id = p.doc_id)
         |, r_drare AS (SELECT shingle FROM r_dtag GROUP BY 1 HAVING COUNT(*) <= 50)
         |, r_dtr AS (SELECT t.doc_id AS train_doc, t.shingle
         |    FROM r_dtag t JOIN r_drare r ON t.shingle = r.shingle WHERE t.split <> 'test')
         |, r_dte AS (SELECT t.doc_id AS test_doc, t.shingle
         |    FROM r_dtag t JOIN r_drare r ON t.shingle = r.shingle WHERE t.split = 'test')
         |, r_dpairs AS (SELECT train_doc, test_doc, COUNT(*) AS shared
         |    FROM r_dtr a JOIN r_dte b ON a.shingle = b.shingle GROUP BY 1, 2)
         |SELECT train_doc AS doc_id,
         |  COUNT(DISTINCT test_doc) AS n_test_docs_overlapping,
         |  MAX(shared) AS max_shared_shingles,
         |  CAST(SUM(shared) AS BIGINT) AS total_shared_shingles,
         |  MAX(shared) >= 3 AS is_contaminated
         |FROM r_dpairs GROUP BY 1 ORDER BY 1""".stripMargin),
    "corpus_pack" -> e(
      ctx => extensions.Text.corpusPack(ctx).orderBy("doc_id"),
      s"""$duckTokCtes
         |SELECT doc_id, source, n_tokens,
         |  CAST(cum_tokens - n_tokens AS BIGINT) AS start_offset,
         |  CAST((cum_tokens - n_tokens) // 1024 AS BIGINT) AS pack_idx,
         |  CAST((cum_tokens - n_tokens) % 1024 AS BIGINT) AS offset_in_pack
         |FROM (SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tokens,
         |        SUM(CAST(len(toks) AS BIGINT)) OVER (ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
         |      FROM r_toks) x
         |ORDER BY doc_id""".stripMargin),
    "text_repetition" -> e(
      ctx => extensions.Text.repetition(ctx).orderBy("doc_id"),
      s"""$duckTokCtes
         |, r_rt AS (SELECT doc_id, unnest(toks) AS g FROM r_toks)
         |, r_rt1 AS (SELECT doc_id, g, COUNT(*) AS tf FROM r_rt GROUP BY 1, 2)
         |, r_tokstats AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
         |    COUNT(*) AS n_unique_tokens, MAX(tf) AS top_tok_tf FROM r_rt1 GROUP BY 1)
         |, r_rb AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
         |    THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
         |    ELSE [] END) AS g FROM r_toks)
         |, r_rb1 AS (SELECT doc_id, g, COUNT(*) AS tf FROM r_rb GROUP BY 1, 2)
         |, r_bistats AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
         |    MAX(tf) AS top_bigram_tf FROM r_rb1 GROUP BY 1)
         |, r_rg AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 3
         |    THEN list_transform(range(1, len(toks) - 1),
         |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         |    ELSE [] END) AS g FROM r_toks)
         |, r_rg1 AS (SELECT doc_id, g, COUNT(*) AS tf FROM r_rg GROUP BY 1, 2)
         |, r_tristats AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_trigrams,
         |    CAST(SUM(CASE WHEN tf > 1 THEN tf ELSE 0 END) AS BIGINT) AS dup_trigram_occ
         |  FROM r_rg1 GROUP BY 1)
         |SELECT t.doc_id, t.n_tokens, t.n_unique_tokens,
         |  ${dv("t.n_unique_tokens", "NULLIF(t.n_tokens, 0)")} AS unique_token_ratio,
         |  ${dv("t.top_tok_tf", "NULLIF(t.n_tokens, 0)")} AS top_token_share,
         |  ${dv("b.top_bigram_tf", "NULLIF(b.n_bigrams, 0)")} AS top_bigram_share,
         |  ${dv("COALESCE(g.dup_trigram_occ, 0)", "NULLIF(g.n_trigrams, 0)")} AS dup_trigram_frac,
         |  (${dv("b.top_bigram_tf", "NULLIF(b.n_bigrams, 0)")} > 0.1 OR
         |   ${dv("COALESCE(g.dup_trigram_occ, 0)", "NULLIF(g.n_trigrams, 0)")} > 0.5) AS is_repetitive
         |FROM r_tokstats t
         |LEFT JOIN r_bistats b ON t.doc_id = b.doc_id
         |LEFT JOIN r_tristats g ON t.doc_id = g.doc_id
         |ORDER BY t.doc_id""".stripMargin),
    "dedup_chunks" -> e(
      ctx => extensions.Text.dedupChunks(ctx).orderBy("doc_id"),
      s"""$duckTokCtes
         |, r_ch0 AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 10
         |    THEN list_transform(range(0, len(toks) - 9, 10),
         |      i -> md5(array_to_string(list_slice(toks, i + 1, i + 10), ' ')))
         |    ELSE [] END) AS chunk_hash FROM r_toks)
         |, r_ch AS (SELECT DISTINCT doc_id, chunk_hash FROM r_ch0)
         |, r_chfirst AS (SELECT chunk_hash, MIN(doc_id) AS first_doc
         |    FROM r_ch GROUP BY 1)
         |SELECT c.doc_id, COUNT(*) AS n_chunks,
         |  CAST(SUM(CASE WHEN f.first_doc < c.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
         |  ${dv("SUM(CASE WHEN f.first_doc < c.doc_id THEN 1 ELSE 0 END)", "NULLIF(COUNT(*), 0)")} AS dup_chunk_frac,
         |  (${dv("SUM(CASE WHEN f.first_doc < c.doc_id THEN 1 ELSE 0 END)", "NULLIF(COUNT(*), 0)")} >= 0.5) AS is_mostly_duplicate
         |FROM r_ch c JOIN r_chfirst f ON c.chunk_hash = f.chunk_hash
         |GROUP BY 1 ORDER BY 1""".stripMargin),
    "dedup_spans" -> e(
      ctx => extensions.Text.dedupSpans(ctx).orderBy("doc_id"),
      s"""$duckTokCtes
         |, r_wi AS (SELECT doc_id, toks,
         |    unnest(CASE WHEN len(toks) >= 8 THEN range(1, len(toks) - 6) ELSE [] END) AS i
         |  FROM r_toks)
         |, r_w AS (SELECT doc_id, CAST(i - 1 AS INT) AS pos,
         |    md5(array_to_string(list_slice(toks, i, i + 7), ' ')) AS win_hash
         |  FROM r_wi)
         |, r_wshared AS (SELECT win_hash FROM r_w GROUP BY 1
         |    HAVING MIN(doc_id) <> MAX(doc_id))
         |, r_whit AS (SELECT h.doc_id, h.pos
         |    FROM r_w h JOIN r_wshared s USING (win_hash))
         |, r_wisl AS (SELECT doc_id, pos,
         |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
         |  FROM (SELECT doc_id, pos,
         |      CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
         |        THEN 1 ELSE 0 END AS brk
         |    FROM r_whit) z)
         |, r_wcov0 AS (SELECT doc_id, island, MAX(pos) - MIN(pos) + 8 AS span_len
         |    FROM r_wisl GROUP BY 1, 2)
         |, r_wcov AS (SELECT doc_id, COUNT(*) AS n_dup_spans,
         |    CAST(SUM(span_len) AS BIGINT) AS dup_span_tokens
         |  FROM r_wcov0 GROUP BY 1)
         |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
         |  COALESCE(c.n_dup_spans, 0) AS n_dup_spans,
         |  COALESCE(c.dup_span_tokens, 0) AS dup_span_tokens,
         |  ${dv("COALESCE(c.dup_span_tokens, 0)", "NULLIF(len(t.toks), 0)")} AS dup_span_frac,
         |  (${dv("COALESCE(c.dup_span_tokens, 0)", "NULLIF(len(t.toks), 0)")} >= 0.5) AS is_mostly_duplicated
         |FROM r_toks t LEFT JOIN r_wcov c USING (doc_id)
         |ORDER BY t.doc_id""".stripMargin),
    "corpus_sample_stratified" -> e(
      ctx => extensions.Text.sampleStratified(ctx).orderBy("lang"),
      s"""SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN t < '4000' THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
         |  ${dv("SUM(CASE WHEN t < '4000' THEN 1 ELSE 0 END)", "NULLIF(COUNT(*), 0)")} AS achieved_rate,
         |  CAST(0.25 AS DOUBLE) AS target_rate,
         |  MIN(CASE WHEN t < '4000' THEN doc_id END) AS min_sampled_doc,
         |  MAX(CASE WHEN t < '4000' THEN doc_id END) AS max_sampled_doc
         |FROM (SELECT doc_id, lang,
         |        substr(md5('sample|' || CAST(doc_id AS VARCHAR)), 1, 4) AS t
         |      FROM documents) x
         |GROUP BY 1 ORDER BY 1""".stripMargin),
    "corpus_length_stats" -> e(
      ctx => extensions.Text.lengthStats(ctx).orderBy("source"),
      s"""$duckTokCtes
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(len(toks)) AS BIGINT) AS total_tokens,
         |  CAST(MIN(len(toks)) AS BIGINT) AS min_tokens,
         |  CAST(MAX(len(toks)) AS BIGINT) AS max_tokens,
         |  ${avgE("len(toks)")} AS avg_tokens,
         |  percentile_cont(0.25) WITHIN GROUP (ORDER BY len(toks)) AS p25_tokens,
         |  percentile_cont(0.50) WITHIN GROUP (ORDER BY len(toks)) AS p50_tokens,
         |  percentile_cont(0.75) WITHIN GROUP (ORDER BY len(toks)) AS p75_tokens,
         |  percentile_cont(0.95) WITHIN GROUP (ORDER BY len(toks)) AS p95_tokens
         |FROM r_toks GROUP BY 1 ORDER BY 1""".stripMargin),
    "source_top_terms" -> e(
      ctx => extensions.Text.sourceTopTerms(ctx).orderBy("source", "term_rank"),
      s"""$duckTokCtes
         |, r_st AS (SELECT source, unnest(toks) AS tok FROM r_toks)
         |, r_stf AS (SELECT source, tok, COUNT(*) AS tf FROM r_st GROUP BY 1, 2)
         |, r_sdf AS (SELECT tok, COUNT(*) AS source_df FROM r_stf GROUP BY 1)
         |, r_ssc AS (SELECT f.source, f.tok, f.tf, d.source_df,
         |    ${dv("f.tf", "d.source_df")} AS score
         |  FROM r_stf f JOIN r_sdf d ON f.tok = d.tok)
         |SELECT source, term_rank, tok, tf, source_df, score
         |FROM (SELECT *,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY score DESC, tok) AS INT) AS term_rank
         |  FROM r_ssc) r
         |WHERE term_rank <= 5
         |ORDER BY source, term_rank""".stripMargin),
    "events_asof_attribution" -> e(
      ctx => extensions.Events.asofAttribution(ctx).orderBy("event_id"),
      """, r_apo AS (SELECT event_id, user_id, ts, value FROM events
        |    WHERE event_type = 'purchase')
        |, r_ato AS (SELECT user_id AS touch_user, ts AS touch_ts,
        |    event_type AS last_touch_type FROM events
        |    WHERE event_type <> 'purchase')
        |SELECT p.event_id, p.user_id,
        |  CAST(epoch_ns(p.ts) // 1000000000 AS BIGINT) AS purchase_epoch_s,
        |  p.value,
        |  t.last_touch_type,
        |  CAST(epoch_ns(t.touch_ts) // 1000000000 AS BIGINT) AS last_touch_epoch_s,
        |  CAST((epoch_ns(p.ts) - epoch_ns(t.touch_ts)) // 1000000000 AS BIGINT) AS secs_since_touch
        |FROM r_apo p ASOF LEFT JOIN r_ato t
        |  ON p.user_id = t.touch_user AND p.ts >= t.touch_ts
        |ORDER BY event_id""".stripMargin),
    "events_asof_windowed" -> e(
      ctx => extensions.Events.asofAttributionWindowed(ctx).orderBy("event_id"),
      """, r_wpo AS (SELECT event_id, user_id, ts, value FROM events
        |    WHERE event_type = 'purchase')
        |, r_wto AS (SELECT user_id AS touch_user, ts AS touch_ts,
        |    event_type AS last_touch_type FROM events
        |    WHERE event_type <> 'purchase')
        |SELECT p.event_id, p.user_id,
        |  CAST(epoch_ns(p.ts) // 1000000000 AS BIGINT) AS purchase_epoch_s,
        |  p.value,
        |  CASE WHEN epoch_ns(p.ts) - epoch_ns(t.touch_ts) <= 600000000000 THEN t.last_touch_type END AS last_touch_type,
        |  CASE WHEN epoch_ns(p.ts) - epoch_ns(t.touch_ts) <= 600000000000
        |    THEN CAST(epoch_ns(t.touch_ts) // 1000000000 AS BIGINT) END AS last_touch_epoch_s,
        |  CASE WHEN epoch_ns(p.ts) - epoch_ns(t.touch_ts) <= 600000000000
        |    THEN CAST((epoch_ns(p.ts) - epoch_ns(t.touch_ts)) // 1000000000 AS BIGINT) END AS secs_since_touch
        |FROM r_wpo p ASOF LEFT JOIN r_wto t
        |  ON p.user_id = t.touch_user AND p.ts >= t.touch_ts
        |ORDER BY event_id""".stripMargin),
    "media_features" -> e(
      ctx => extensions.Multimodal.mediaFeatures(ctx).orderBy("media_id"),
      """SELECT doc_id AS media_id, 'text' AS modality, source,
        |  CAST(length(text) AS BIGINT) AS byte_length,
        |  CAST(CASE WHEN length(text) > 0 THEN ascii(substr(text, 1, 1)) ELSE -1 END AS INT) AS first_byte,
        |  CAST(COALESCE(list_sum(list_transform(range(1, least(length(text), 64) + 1),
        |    i -> ascii(substr(text, i, 1)))), 0) % 997 AS BIGINT) AS checksum64
        |FROM documents ORDER BY media_id""".stripMargin),
    "media_resize" -> e(
      ctx => extensions.Multimodal.mediaResize(ctx).orderBy("media_id"),
      """SELECT doc_id AS media_id, 'text' AS modality,
        |  CAST(length(text) AS BIGINT) AS original_bytes,
        |  64 AS resized_bytes,
        |  CAST(GREATEST(0, 64 - length(text)) AS INT) AS pad_bytes,
        |  length(text) > 64 AS was_truncated,
        |  CAST(COALESCE(list_sum(list_transform(range(1, least(length(text), 64) + 1),
        |    i -> ascii(substr(text, i, 1)))), 0) % 997 AS BIGINT) AS resized_checksum
        |FROM documents ORDER BY media_id""".stripMargin),
    "media_frame_sample" -> e(
      ctx => extensions.Multimodal.frameSample(ctx)
        .orderBy("media_id", "frame_idx"),
      """, r_mfr AS (SELECT doc_id AS media_id, text,
        |    CAST(unnest(range(0, length(text) // 32)) AS INT) AS frame_idx
        |  FROM documents)
        |SELECT media_id, frame_idx,
        |  32 AS frame_bytes,
        |  CAST(list_sum(list_transform(range(1, 33),
        |    j -> ascii(substr(text, frame_idx * 32 + j, 1)))) % 997 AS BIGINT) AS frame_checksum
        |FROM r_mfr WHERE frame_idx % 4 = 0
        |ORDER BY media_id, frame_idx""".stripMargin),
    "regional_revenue_rollup" -> e(
      ctx => extensions.Analytics.regionalRevenueRollup(ctx)
        .orderBy(col("region_subtotal"), coalesce(col("region_name"), lit("")),
          col("nation_subtotal"), coalesce(col("nation_name"), lit(""))),
      s"""SELECT c.customer_region_name AS region_name,
         |  c.customer_nation_name AS nation_name,
         |  CAST(GROUPING(c.customer_region_name) AS INT) AS region_subtotal,
         |  CAST(GROUPING(c.customer_nation_name) AS INT) AS nation_subtotal,
         |  COUNT(DISTINCT o.order_key) AS order_count,
         |  COUNT(DISTINCT o.customer_key) AS customer_count,
         |  ${sumD("o.gross_item_sales_amount")} AS gross_revenue,
         |  ${sumD("o.net_item_sales_amount")} AS net_revenue
         |FROM w_fct_orders o JOIN w_dim_customer c ON o.customer_key = c.customer_key
         |GROUP BY ROLLUP(c.customer_region_name, c.customer_nation_name)
         |ORDER BY region_subtotal, COALESCE(region_name, ''),
         |  nation_subtotal, COALESCE(nation_name, '')""".stripMargin),
    "customer_value_percentiles" -> e(
      ctx => extensions.Analytics.customerValuePercentiles(ctx)
        .orderBy("customer_key"),
      s""", r_cvp AS (SELECT customer_key, COUNT(*) AS order_count,
         |    SUM(gross_item_sales_amount) AS spend_d
         |  FROM w_fct_orders GROUP BY 1)
         |SELECT customer_key, CAST(spend_d AS DOUBLE) AS total_spend,
         |  order_count,
         |  CAST(RANK() OVER w AS INT) AS spend_rank,
         |  PERCENT_RANK() OVER w AS pct_rank,
         |  CUME_DIST() OVER w AS cume_dist_val
         |FROM r_cvp
         |WINDOW w AS (ORDER BY spend_d DESC)
         |ORDER BY customer_key""".stripMargin),
    "corpus_bigram_lm" -> e(
      ctx => extensions.Text.bigramLm(ctx).orderBy("w1", "next_rank"),
      s"""$duckTokCtes
         |, r_bg AS (SELECT unnest(toks[1:len(toks)-1]) AS w1,
         |    unnest(toks[2:len(toks)]) AS w2
         |  FROM r_toks WHERE len(toks) >= 2)
         |, r_bc AS (SELECT w1, w2, COUNT(*) AS pair_count FROM r_bg GROUP BY 1, 2)
         |, r_bt AS (SELECT w1, CAST(SUM(pair_count) AS BIGINT) AS w1_count
         |  FROM r_bc GROUP BY 1)
         |SELECT w1, next_rank, w2, pair_count, w1_count, prob
         |FROM (SELECT c.w1,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY c.w1
         |      ORDER BY c.pair_count DESC, c.w2) AS INT) AS next_rank,
         |    c.w2, c.pair_count, t.w1_count,
         |    ${dv("c.pair_count", "t.w1_count")} AS prob
         |  FROM r_bc c JOIN r_bt t ON c.w1 = t.w1) r
         |WHERE next_rank <= 3
         |ORDER BY w1, next_rank""".stripMargin),
    "text_lm_score" -> e(
      ctx => extensions.Text.lmScore(ctx).orderBy("doc_id"),
      s"""$duckTokCtes
         |, r_lf_bg AS (SELECT doc_id, unnest(toks[1:len(toks)-1]) AS w1,
         |    unnest(toks[2:len(toks)]) AS w2
         |  FROM r_toks WHERE len(toks) >= 2)
         |, r_lf_cnt AS (SELECT w1, w2, COUNT(*) AS pair_count
         |  FROM r_lf_bg GROUP BY 1, 2)
         |, r_lf_tot AS (SELECT w1, CAST(SUM(pair_count) AS BIGINT) AS w1_count
         |  FROM r_lf_cnt GROUP BY 1)
         |, r_lf_st AS (SELECT c.w1, c.w2, c.pair_count, t.w1_count,
         |    CAST(ROUND(${dv("c.pair_count", "t.w1_count")}, 9) AS DECIMAL(12,9)) AS pdec
         |  FROM r_lf_cnt c JOIN r_lf_tot t ON c.w1 = t.w1)
         |, r_lf_doc AS (SELECT b.doc_id,
         |    COUNT(*) AS n_bigrams,
         |    COUNT(CASE WHEN s.pair_count * 32 >= s.w1_count THEN 1 END) AS n_predictable,
         |    SUM(s.pdec) AS psum
         |  FROM r_lf_bg b JOIN r_lf_st s ON b.w1 = s.w1 AND b.w2 = s.w2
         |  GROUP BY 1)
         |SELECT d.doc_id,
         |  COALESCE(r.n_bigrams, 0) AS n_bigrams,
         |  COALESCE(r.n_predictable, 0) AS n_predictable,
         |  ${rnd(dv("r.n_predictable", "r.n_bigrams"), 6)} AS predictable_share,
         |  ${rnd(dv("r.psum", "r.n_bigrams"), 9)} AS mean_prob
         |FROM documents d LEFT JOIN r_lf_doc r ON d.doc_id = r.doc_id
         |ORDER BY d.doc_id""".stripMargin),
    "events_user_journeys" -> e(
      ctx => extensions.Events.userJourneys(ctx).orderBy("from_type", "to_type"),
      s""", r_uj AS (SELECT user_id, event_id, ts, event_type,
         |    LEAD(event_type) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS next_type
         |  FROM events)
         |, r_ujc AS (SELECT event_type AS from_type, next_type AS to_type,
         |    COUNT(*) AS n_transitions
         |  FROM r_uj WHERE next_type IS NOT NULL GROUP BY 1, 2)
         |, r_ujt AS (SELECT from_type,
         |    CAST(SUM(n_transitions) AS BIGINT) AS from_total
         |  FROM r_ujc GROUP BY 1)
         |SELECT c.from_type, c.to_type, c.n_transitions, t.from_total,
         |  ${dv("c.n_transitions", "t.from_total")} AS transition_prob
         |FROM r_ujc c JOIN r_ujt t ON c.from_type = t.from_type
         |ORDER BY c.from_type, c.to_type""".stripMargin),
    "source_lang_diversity" -> e(
      ctx => extensions.Text.sourceLangDiversity(ctx).orderBy("source"),
      s""", r_ld AS (SELECT source, lang, COUNT(*) AS c FROM documents GROUP BY 1, 2)
         |, r_lda AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs,
         |    COUNT(*) AS n_langs, CAST(SUM(c * c) AS BIGINT) AS ss
         |  FROM r_ld GROUP BY 1)
         |, r_ldm AS (SELECT source, lang AS majority_lang, c AS mc FROM (
         |    SELECT source, lang, c, ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY c DESC, lang DESC) AS rn FROM r_ld) x WHERE rn = 1)
         |SELECT a.source, a.n_docs, a.n_langs, m.majority_lang,
         |  ${dv("m.mc", "a.n_docs")} AS majority_share,
         |  ${dv("(a.n_docs * a.n_docs - a.ss)", "(a.n_docs * a.n_docs)")} AS gini_impurity
         |FROM r_lda a JOIN r_ldm m ON a.source = m.source
         |ORDER BY a.source""".stripMargin),
    "supplier_portfolio_overlap" -> e(
      ctx => extensions.Analytics.supplierPortfolioOverlap(ctx)
        .orderBy("supplier_a", "supplier_b"),
      s""", r_spp AS (SELECT DISTINCT supplier_key, part_key FROM o_ps)
         |, r_spz AS (SELECT supplier_key, COUNT(*) AS n_parts
         |    FROM r_spp GROUP BY 1)
         |, r_spi AS (SELECT a.supplier_key AS supplier_a,
         |    b.supplier_key AS supplier_b, COUNT(*) AS shared_parts
         |  FROM r_spp a JOIN r_spp b
         |    ON a.part_key = b.part_key AND a.supplier_key < b.supplier_key
         |  GROUP BY 1, 2)
         |SELECT i.supplier_a, i.supplier_b, i.shared_parts,
         |  za.n_parts AS parts_a, zb.n_parts AS parts_b,
         |  ${dv("i.shared_parts", "(za.n_parts + zb.n_parts - i.shared_parts)")}
         |    AS portfolio_jaccard
         |FROM r_spi i
         |JOIN r_spz za ON i.supplier_a = za.supplier_key
         |JOIN r_spz zb ON i.supplier_b = zb.supplier_key
         |ORDER BY 1, 2""".stripMargin),
    "date_spine" -> e(
      ctx => extensions.Analytics.dateSpine(ctx).orderBy("date_day"),
      """, r_dsb AS (SELECT MIN(order_date) AS lo, MAX(order_date) AS hi
        |    FROM base_orders)
        |, r_dsd AS (SELECT CAST(UNNEST(generate_series(lo, hi,
        |    INTERVAL 1 DAY)) AS DATE) AS date_day FROM r_dsb)
        |SELECT date_day,
        |  CAST(EXTRACT(YEAR FROM date_day) AS INT) AS year,
        |  CAST(EXTRACT(QUARTER FROM date_day) AS INT) AS quarter,
        |  CAST(EXTRACT(MONTH FROM date_day) AS INT) AS month,
        |  CAST(EXTRACT(DAY FROM date_day) AS INT) AS day_of_month,
        |  CAST((date_diff('day', DATE '1970-01-01', date_day) + 4) % 7 AS INT)
        |    AS weekday_idx,
        |  CAST(date_trunc('month', date_day) AS DATE) AS month_start
        |FROM r_dsd ORDER BY date_day""".stripMargin),
    "events_session_cooccurrence" -> e(
      ctx => extensions.Events.sessionCooccurrence(ctx).orderBy("type_a", "type_b"),
      s""", r_cse AS (SELECT user_id, event_id, event_type,
         |    CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts_sec FROM events)
         |, r_csf AS (SELECT *, CASE WHEN LAG(ts_sec) OVER w IS NULL
         |      OR ts_sec - LAG(ts_sec) OVER w > 1800 THEN 1 ELSE 0 END AS is_new
         |  FROM r_cse WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id))
         |, r_css AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id
         |    ORDER BY ts_sec, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
         |  FROM r_csf)
         |, r_cst AS (SELECT DISTINCT user_id, session_idx, event_type FROM r_css)
         |, r_csn AS (SELECT COUNT(*) AS n_sessions FROM
         |    (SELECT DISTINCT user_id, session_idx FROM r_cst) x)
         |, r_csc AS (SELECT event_type, COUNT(*) AS type_sessions
         |    FROM r_cst GROUP BY 1)
         |, r_csp AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
         |    COUNT(*) AS pair_sessions
         |  FROM r_cst a JOIN r_cst b ON a.user_id = b.user_id
         |    AND a.session_idx = b.session_idx AND a.event_type < b.event_type
         |  GROUP BY 1, 2)
         |SELECT p.type_a, p.type_b, p.pair_sessions,
         |  ca.type_sessions AS a_sessions, cb.type_sessions AS b_sessions,
         |  n.n_sessions,
         |  ${dv("p.pair_sessions", "n.n_sessions")} AS support,
         |  ${dv("p.pair_sessions * n.n_sessions",
              "ca.type_sessions * cb.type_sessions")} AS lift
         |FROM r_csp p
         |JOIN r_csc ca ON p.type_a = ca.event_type
         |JOIN r_csc cb ON p.type_b = cb.event_type
         |CROSS JOIN r_csn n
         |ORDER BY 1, 2""".stripMargin),
    "events_sliding_rates" -> e(
      ctx => extensions.Events.slidingRates(ctx)
        .orderBy("event_type", "window_start"),
      s""", r_sr AS (SELECT event_type,
         |    CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS sec,
         |    UNNEST(range(4)) AS k
         |  FROM events)
         |, r_sr2 AS (SELECT event_type,
         |    (sec // 900 * 900) - k * 900 AS window_start FROM r_sr)
         |, r_sr3 AS (SELECT event_type, window_start, COUNT(*) AS n_events
         |    FROM r_sr2 GROUP BY 1, 2)
         |SELECT event_type, CAST(window_start AS BIGINT) AS window_start,
         |  CAST(window_start + 3600 AS BIGINT) AS window_end, n_events,
         |  ${dv("n_events", "60")} AS events_per_minute
         |FROM r_sr3 ORDER BY 1, 2""".stripMargin),
    "events_hourly_seasonality" -> e(
      ctx => extensions.Events.hourlySeasonality(ctx)
        .orderBy("event_type", "hour_of_day"),
      s""", r_hs AS (SELECT event_type,
         |    CAST(epoch_ns(ts) // 1000000000 // 3600 % 24 AS BIGINT) AS hour_of_day,
         |    COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS unique_users
         |  FROM events GROUP BY 1, 2)
         |, r_hst AS (SELECT event_type, CAST(SUM(n_events) AS BIGINT) AS type_total
         |    FROM r_hs GROUP BY 1)
         |SELECT s.event_type, s.hour_of_day, s.n_events, s.unique_users,
         |  ${dv("s.n_events", "t.type_total")} AS share_of_type
         |FROM r_hs s JOIN r_hst t ON s.event_type = t.event_type
         |ORDER BY 1, 2""".stripMargin),
    "order_weekday_profile" -> e(
      ctx => extensions.Analytics.orderWeekdayProfile(ctx).orderBy("weekday_idx"),
      s""", r_wd AS (SELECT
         |    CAST((date_diff('day', DATE '1970-01-01', order_date) + 4) % 7 AS INT)
         |      AS weekday_idx,
         |    order_amount
         |  FROM base_orders)
         |, r_wda AS (SELECT weekday_idx, COUNT(*) AS n_orders,
         |    SUM(order_amount) AS rev FROM r_wd GROUP BY 1)
         |, r_wdt AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS all_orders,
         |    SUM(rev) AS all_rev FROM r_wda)
         |SELECT w.weekday_idx, w.n_orders, CAST(w.rev AS DOUBLE) AS revenue,
         |  ${dv("w.n_orders", "t.all_orders")} AS order_share,
         |  ${dv("w.rev", "t.all_rev")} AS revenue_share
         |FROM r_wda w CROSS JOIN r_wdt t ORDER BY 1""".stripMargin),
    "dedup_minhash_recall" -> e(
      ctx => extensions.Text.minhashRecall(ctx),
      s"""$duckTokCtes
         |, r_mrs AS (SELECT doc_id FROM documents
         |    WHERE substr(md5('rsample|' || CAST(doc_id AS VARCHAR)), 1, 1) < '4')
         |, r_msh AS (SELECT s.doc_id, s.shingle FROM r_sh s
         |    JOIN r_mrs m ON s.doc_id = m.doc_id)
         |, r_msz AS (SELECT doc_id, COUNT(*) AS sz FROM r_msh GROUP BY 1)
         |, r_mi AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
         |    FROM r_msh a JOIN r_msh b
         |      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |    GROUP BY 1, 2)
         |, r_mtruth AS (SELECT i.doc_a, i.doc_b FROM r_mi i
         |    JOIN r_msz za ON i.doc_a = za.doc_id
         |    JOIN r_msz zb ON i.doc_b = zb.doc_id
         |    WHERE ${dv("i.i", "(za.sz + zb.sz - i.i)")} >= 0.5)
         |, r_msig AS ($duckSig16Body)
         |, r_mbands AS (
         |    SELECT doc_id, 0 AS band_idx, md5(h0 || h1 || h2 || h3) AS band_hash FROM r_msig
         |    UNION ALL SELECT doc_id, 1, md5(h4 || h5 || h6 || h7) FROM r_msig
         |    UNION ALL SELECT doc_id, 2, md5(h8 || h9 || h10 || h11) FROM r_msig
         |    UNION ALL SELECT doc_id, 3, md5(h12 || h13 || h14 || h15) FROM r_msig)
         |, r_mdet AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |    FROM r_mbands a
         |    JOIN r_mbands b ON a.band_idx = b.band_idx
         |      AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
         |    JOIN r_mrs sa ON a.doc_id = sa.doc_id
         |    JOIN r_mrs sb ON b.doc_id = sb.doc_id)
         |SELECT COUNT(*) AS n_true_pairs,
         |  CAST(SUM(CASE WHEN d.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_detected,
         |  ${dv("SUM(CASE WHEN d.doc_a IS NOT NULL THEN 1 ELSE 0 END)",
               "NULLIF(COUNT(*), 0)")} AS recall
         |FROM r_mtruth t
         |LEFT JOIN r_mdet d ON t.doc_a = d.doc_a AND t.doc_b = d.doc_b""".stripMargin),
    "customer_order_gaps" -> e(
      ctx => extensions.Analytics.customerOrderGaps(ctx).orderBy("segment"),
      s""", r_og AS (SELECT o.customer_key,
         |    datediff('day', LAG(o.order_date) OVER w, o.order_date) AS gap_days,
         |    c.customer_market_segment_name AS segment
         |  FROM base_orders o JOIN base_customer c
         |    ON o.customer_key = c.customer_key
         |  WINDOW w AS (PARTITION BY o.customer_key
         |    ORDER BY o.order_date, o.order_key))
         |SELECT segment,
         |  COUNT(DISTINCT CASE WHEN gap_days IS NOT NULL THEN customer_key END)
         |    AS repeat_customers,
         |  COUNT(gap_days) AS n_gaps,
         |  ${dv("SUM(gap_days)", "COUNT(gap_days)")} AS avg_gap_days,
         |  MIN(gap_days) AS min_gap_days,
         |  percentile_cont(0.5) WITHIN GROUP (ORDER BY gap_days) AS median_gap_days,
         |  MAX(gap_days) AS max_gap_days
         |FROM r_og GROUP BY 1 ORDER BY 1""".stripMargin),
    "events_retention_triangle" -> e(
      ctx => extensions.Events.retentionTriangle(ctx)
        .orderBy("cohort_day", "day_offset"),
      """, r_rd AS (SELECT DISTINCT user_id,
        |    CAST(epoch_ns(ts) // 1000000000 // 86400 AS BIGINT) AS day_idx
        |  FROM events)
        |, r_rf AS (SELECT user_id, MIN(day_idx) AS cohort_day FROM r_rd GROUP BY 1)
        |, r_rs AS (SELECT cohort_day, COUNT(DISTINCT user_id) AS cohort_users
        |    FROM r_rf GROUP BY 1)
        |, r_ra AS (SELECT f.cohort_day, d.day_idx - f.cohort_day AS day_offset,
        |    COUNT(DISTINCT d.user_id) AS active_users
        |  FROM r_rd d JOIN r_rf f ON d.user_id = f.user_id
        |  WHERE d.day_idx - f.cohort_day <= 13
        |  GROUP BY 1, 2)
        |SELECT a.cohort_day, a.day_offset, a.active_users, s.cohort_users,
        |  (CAST(a.active_users AS DOUBLE) / CAST(s.cohort_users AS DOUBLE)) AS retention_rate
        |FROM r_ra a JOIN r_rs s ON a.cohort_day = s.cohort_day
        |ORDER BY a.cohort_day, a.day_offset""".stripMargin),
    "events_anomaly_zscore" -> e(
      ctx => extensions.Events.anomalyZscore(ctx).orderBy("event_type", "day_idx"),
      """, r_az AS (SELECT event_type,
        |    CAST(epoch_ns(ts) // 1000000000 // 86400 AS BIGINT) AS day_idx,
        |    COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2)
        |, r_azw AS (SELECT event_type, day_idx, n_events,
        |    CAST(SUM(n_events) OVER w AS BIGINT) AS w_sum,
        |    CAST(SUM(n_events * n_events) OVER w AS BIGINT) AS w_sumsq,
        |    COUNT(n_events) OVER w AS w_cnt
        |  FROM r_az
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day_idx
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |, r_azm AS (SELECT event_type, day_idx, n_events, w_cnt,
        |    CAST(w_sum AS DOUBLE) / CAST(w_cnt AS DOUBLE) AS w_mean,
        |    SQRT((CAST(w_sumsq AS DOUBLE)
        |        - CAST(w_sum AS DOUBLE) * CAST(w_sum AS DOUBLE) / CAST(w_cnt AS DOUBLE))
        |      / (CAST(w_cnt AS DOUBLE) - 1)) AS w_sd
        |  FROM r_azw WHERE w_cnt >= 2)
        |SELECT event_type, day_idx, n_events, w_cnt, w_mean, w_sd,
        |  CASE WHEN w_sd = 0 THEN NULL
        |    ELSE (CAST(n_events AS DOUBLE) - w_mean) / w_sd END AS z_score,
        |  ABS(CASE WHEN w_sd = 0 THEN NULL
        |    ELSE (CAST(n_events AS DOUBLE) - w_mean) / w_sd END) > 2 AS is_anomaly
        |FROM r_azm ORDER BY event_type, day_idx""".stripMargin),
    "corpus_sample_weighted" -> e(
      ctx => extensions.Text.sampleWeighted(ctx).orderBy("source"),
      s"""SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
         |  ${dv("SUM(LEAST(n_chars, 2000))", "(COUNT(*) * 2000)")} AS target_rate,
         |  ${dv("SUM(CASE WHEN kept THEN 1 ELSE 0 END)", "NULLIF(COUNT(*), 0)")} AS achieved_rate,
         |  MIN(CASE WHEN kept THEN doc_id END) AS min_sampled_doc,
         |  MAX(CASE WHEN kept THEN doc_id END) AS max_sampled_doc
         |FROM (SELECT doc_id, source, n_chars,
         |        ('0x' || substr(md5('wsample|' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT * 2000
         |          < n_chars * 65536 AS kept
         |      FROM documents) x
         |GROUP BY 1 ORDER BY 1""".stripMargin),
    "corpus_vocab" -> e(
      ctx => extensions.Text.corpusVocab(ctx).orderBy("token_id"),
      s"""$duckTokCtes
         |, r_vt AS (SELECT doc_id, unnest(toks) AS tok FROM r_toks)
         |, r_vc AS (SELECT tok, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
         |    FROM r_vt GROUP BY 1)
         |SELECT CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, tok) AS INT) AS token_id,
         |  tok, tf, df
         |FROM r_vc ORDER BY token_id""".stripMargin),
    "price_percentiles_exact" -> e(
      ctx => operators.ExactQuantile.percentiles(
        ctx.tbl("lineitem"), "l_extendedprice", Seq(0.25, 0.5, 0.75, 0.95))
        .orderBy("quantile"),
      Seq(0.25, 0.5, 0.75, 0.95).map(q =>
        s"""SELECT CAST($q AS DOUBLE) AS quantile,
           |  percentile_cont($q) WITHIN GROUP (ORDER BY CAST(l_extendedprice AS DOUBLE)) AS value
           |FROM lineitem""".stripMargin).mkString("", "\nUNION ALL\n", "\nORDER BY quantile")),
    "in_transit_by_day" -> e(
      ctx => extensions.Analytics.inTransitByDay(ctx),
      s"""SELECT d.day, COUNT(*) AS lines_in_transit,
         |  CAST(SUM(l.quantity) AS DOUBLE) AS qty_in_transit
         |FROM (SELECT DISTINCT order_date AS day FROM base_orders) d
         |JOIN base_line_item l ON d.day BETWEEN l.ship_date AND l.receipt_date
         |GROUP BY 1 ORDER BY 1""".stripMargin),
    "corpus_chunk" -> e(
      ctx => extensions.Text.corpusChunk(ctx),
      s"""$duckTokCtes
         |, r_ck AS (SELECT doc_id, toks, len(toks) AS n_toks
         |    FROM r_toks WHERE len(toks) > 0)
         |, r_ck2 AS (SELECT doc_id, n_toks, toks,
         |    UNNEST(range(0, n_toks, 48)) AS chunk_start FROM r_ck)
         |, r_ck3 AS (SELECT doc_id,
         |    CAST(chunk_start // 48 AS INT) AS chunk_idx, chunk_start,
         |    list_slice(toks, chunk_start + 1, chunk_start + 64) AS ct
         |  FROM r_ck2)
         |SELECT doc_id, chunk_idx, chunk_start,
         |  CAST(len(ct) AS INT) AS chunk_len,
         |  md5(array_to_string(ct, ' ')) AS chunk_hash,
         |  COUNT(*) OVER (PARTITION BY doc_id) AS n_chunks
         |FROM r_ck3 ORDER BY doc_id, chunk_idx""".stripMargin),
    "text_pii_redact" -> e(
      ctx => extensions.Text.piiRedact(ctx),
      s""", r_pii AS (SELECT doc_id, source,
         |    text ||
         |    CASE WHEN doc_id % 7 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
         |    CASE WHEN doc_id % 5 = 0 THEN ' call 555-123-4567' ELSE '' END ||
         |    CASE WHEN doc_id % 11 = 0 THEN ' from 10.0.123.45' ELSE '' END AS raw
         |  FROM documents)
         |, r_piic AS (SELECT doc_id, source,
         |    CAST(len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', 0)) AS INT) AS n_emails,
         |    CAST(len(regexp_extract_all(raw, '[0-9]{3}-[0-9]{3}-[0-9]{4}', 0)) AS INT) AS n_phones,
         |    CAST(len(regexp_extract_all(raw, '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}', 0)) AS INT) AS n_ips,
         |    CAST(length(regexp_replace(regexp_replace(regexp_replace(raw,
         |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
         |      '[0-9]{3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g'),
         |      '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}', '[IP]', 'g')) AS INT) AS redacted_chars
         |  FROM r_pii)
         |SELECT doc_id, source, n_emails, n_phones, n_ips, redacted_chars,
         |  (n_emails + n_phones + n_ips = 0) AS is_clean
         |FROM r_piic ORDER BY doc_id""".stripMargin),
    // heavyHittersEAGER by name: pass 1 runs at construction (InSet form,
    // 3.5-4x cheaper than the lazy semi-join twin Text.heavyHitters) —
    // correct here because the driver times fn(spark, dir) inclusively.
    "text_heavy_hitters" -> e(
      ctx => extensions.Text.heavyHittersEager(ctx),
      s"""$duckTokCtes
         |, r_hh_t AS (SELECT unnest(toks) AS tok FROM r_toks)
         |, r_hh_n AS (SELECT COUNT(*) AS n FROM r_hh_t)
         |SELECT tok, COUNT(*) AS cnt, MAX(n) AS total_tokens,
         |  ${dv("COUNT(*)", "MAX(n)")} AS share
         |FROM r_hh_t, r_hh_n
         |GROUP BY tok
         |HAVING COUNT(*) * 500 > MAX(n)
         |ORDER BY cnt DESC, tok""".stripMargin),
    "events_value_histogram" -> e(
      ctx => extensions.Events.valueHistogram(ctx).orderBy("event_type", "bucket"),
      s""", r_vh AS (SELECT event_type,
         |    CAST(FLOOR(value / 25.0) AS BIGINT) AS bucket,
         |    COUNT(*) AS n_events, MIN(value) AS min_value, MAX(value) AS max_value
         |  FROM events GROUP BY 1, 2)
         |SELECT event_type, bucket,
         |  bucket * 25.0 AS bucket_lo, (bucket + 1) * 25.0 AS bucket_hi,
         |  n_events, min_value, max_value,
         |  ${dv("n_events", "SUM(n_events) OVER (PARTITION BY event_type)")} AS share_of_type
         |FROM r_vh ORDER BY event_type, bucket""".stripMargin),
    "order_priority_melt" -> e(
      ctx => extensions.Analytics.orderPriorityMelt(ctx)
        .orderBy("order_year", "priority_class"),
      """, r_py AS (SELECT DISTINCT CAST(EXTRACT(YEAR FROM order_date) AS INT) AS order_year
        |    FROM w_fct_orders)
        |, r_pc AS (SELECT * FROM (VALUES
        |    ('1-URGENT', 'urgent_orders'), ('2-HIGH', 'high_orders'),
        |    ('3-MEDIUM', 'medium_orders'), ('4-NOT SPECIFIED', 'not_specified_orders'),
        |    ('5-LOW', 'low_orders')) t(code, priority_class))
        |, r_pn AS (SELECT CAST(EXTRACT(YEAR FROM order_date) AS INT) AS order_year,
        |    order_priority_code AS code, COUNT(*) AS n
        |  FROM w_fct_orders GROUP BY 1, 2)
        |SELECT y.order_year, c.priority_class,
        |  CAST(COALESCE(n.n, 0) AS BIGINT) AS n_orders
        |FROM r_py y CROSS JOIN r_pc c
        |LEFT JOIN r_pn n ON n.order_year = y.order_year AND n.code = c.code
        |ORDER BY y.order_year, c.priority_class""".stripMargin),
    "source_similarity" -> e(
      ctx => extensions.Text.sourceSimilarity(ctx).orderBy("source_a", "source_b"),
      s"""$duckTokCtes
         |, r_ssh AS (SELECT DISTINCT t.source, s.shingle
         |    FROM r_sh s JOIN r_toks t ON s.doc_id = t.doc_id)
         |, r_ssz AS (SELECT source, COUNT(*) AS set_size FROM r_ssh GROUP BY 1)
         |, r_sinter AS (SELECT a.source AS source_a, b.source AS source_b,
         |    COUNT(*) AS intersection
         |  FROM r_ssh a JOIN r_ssh b ON a.shingle = b.shingle AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT i.source_a, i.source_b, i.intersection,
         |  za.set_size AS size_a, zb.set_size AS size_b,
         |  ${dv("i.intersection", "(za.set_size + zb.set_size - i.intersection)")} AS jaccard
         |FROM r_sinter i
         |JOIN r_ssz za ON i.source_a = za.source
         |JOIN r_ssz zb ON i.source_b = zb.source
         |ORDER BY source_a, source_b""".stripMargin),
    "customer_activity_setops" -> e(
      ctx => extensions.Analytics.customerActivitySetOps(ctx)
        .orderBy("membership", "customer_key"),
      """, r_so99 AS (SELECT customer_key FROM w_fct_orders
        |    WHERE EXTRACT(YEAR FROM order_date) = 1999)
        |, r_so00 AS (SELECT customer_key FROM w_fct_orders
        |    WHERE EXTRACT(YEAR FROM order_date) = 2000)
        |SELECT membership, customer_key FROM (
        |  SELECT 'retained' AS membership, customer_key FROM
        |    (SELECT customer_key FROM r_so99 INTERSECT SELECT customer_key FROM r_so00)
        |  UNION ALL
        |  SELECT 'churned' AS membership, customer_key FROM
        |    (SELECT customer_key FROM r_so99 EXCEPT SELECT customer_key FROM r_so00)
        |  UNION ALL
        |  SELECT 'acquired' AS membership, customer_key FROM
        |    (SELECT customer_key FROM r_so00 EXCEPT SELECT customer_key FROM r_so99)
        |) x ORDER BY membership, customer_key""".stripMargin),
    "order_priority_pivot" -> e(
      ctx => extensions.Analytics.orderPriorityPivot(ctx).orderBy("order_year"),
      """SELECT CAST(EXTRACT(YEAR FROM order_date) AS INT) AS order_year,
        |  CAST(SUM(CASE WHEN order_priority_code = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent_orders,
        |  CAST(SUM(CASE WHEN order_priority_code = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high_orders,
        |  CAST(SUM(CASE WHEN order_priority_code = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS medium_orders,
        |  CAST(SUM(CASE WHEN order_priority_code = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS not_specified_orders,
        |  CAST(SUM(CASE WHEN order_priority_code = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS low_orders,
        |  COUNT(*) AS total_orders
        |FROM w_fct_orders GROUP BY 1 ORDER BY 1""".stripMargin),
    "customer_order_bookends" -> e(
      ctx => extensions.Analytics.customerOrderBookends(ctx).orderBy("order_key"),
      """SELECT customer_key, order_key, order_date,
        |  CAST(order_amount AS DOUBLE) AS order_amount,
        |  FIRST_VALUE(order_key) OVER w AS first_order_key,
        |  LAST_VALUE(order_key) OVER w AS last_order_key,
        |  NTH_VALUE(order_key, 2) OVER w AS second_order_key,
        |  CAST(FIRST_VALUE(order_amount) OVER w AS DOUBLE) AS first_order_amount,
        |  CAST(LAST_VALUE(order_amount) OVER w AS DOUBLE) AS last_order_amount,
        |  order_key = FIRST_VALUE(order_key) OVER w AS is_first_order
        |FROM base_orders
        |WINDOW w AS (PARTITION BY customer_key ORDER BY order_date, order_key
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY order_key""".stripMargin),
    "ann_knn_graph" -> e(
      ctx => extensions.Similarity.annKnnGraph(ctx).orderBy("vec_id", "rank"),
      s""", r_emb2 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ed,
         |    ${(0 until 8).map(j =>
              s"(CASE WHEN list_sum(list_transform(range(0, len(embedding)), i -> CAST(embedding[i+1] AS DOUBLE) * CAST((i * 31 + $j * 17) % 7 - 3 AS DOUBLE))) >= 0 THEN '1' ELSE '0' END)")
              .mkString(" || ")} AS bucket
         |  FROM embeddings)
         |SELECT vec_id, CAST(rn AS INT) AS rank, neighbor_id, cosine FROM (
         |  SELECT vec_id, neighbor_id, cosine,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY cosine DESC, neighbor_id) AS rn
         |  FROM (SELECT a.vec_id, b.vec_id AS neighbor_id,
         |          ${duckCos("a.ed", "b.ed")} AS cosine
         |        FROM r_emb2 a JOIN r_emb2 b
         |          ON a.bucket = b.bucket AND a.vec_id != b.vec_id) y) x
         |WHERE rn <= 3 ORDER BY vec_id, rank""".stripMargin),
    "events_peak_windows" -> e(
      ctx => extensions.Events.peakWindows(ctx).orderBy("peak_rank"),
      s""", r_pke AS (SELECT event_id, user_id,
         |    CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS sec, value
         |  FROM events)
         |, r_pkh AS (SELECT sec // 3600 * 3600 AS hour_start,
         |    COUNT(*) AS hour_events
         |  FROM r_pke GROUP BY 1)
         |, r_pkw AS (SELECT * FROM (SELECT
         |      CAST(ROW_NUMBER() OVER (ORDER BY hour_events DESC, hour_start) AS INT) AS peak_rank,
         |      hour_start, hour_events,
         |      hour_start - 1800 AS win_start, hour_start + 5400 AS win_end
         |    FROM r_pkh) x WHERE peak_rank <= 3)
         |SELECT w.peak_rank, CAST(w.hour_start AS BIGINT) AS hour_start,
         |  w.hour_events,
         |  CAST(w.win_start AS BIGINT) AS win_start,
         |  CAST(w.win_end AS BIGINT) AS win_end,
         |  COUNT(*) AS n_events, COUNT(DISTINCT e.user_id) AS n_users,
         |  ${sumD("CAST(e.value AS DECIMAL(18,6))")} AS total_value,
         |  MIN(e.event_id) AS min_event_id, MAX(e.event_id) AS max_event_id
         |FROM r_pke e JOIN r_pkw w ON e.sec >= w.win_start AND e.sec < w.win_end
         |GROUP BY 1, 2, 3, 4, 5 ORDER BY 1""".stripMargin),
    // dbt `source freshness` twin (reference models/_source/source_tpch.yml:
    // 11-16 event_time) — watermark + staleness grade per declared source,
    // graded against the corpus watermark so the check is deterministic
    "source_freshness" -> e(
      ctx => Freshness.report(ctx),
      s""", f_legs AS (
         |  SELECT 'events' AS source_table, 'ts' AS event_time_col,
         |    COUNT(*) AS n_rows,
         |    CAST(epoch_ns(MIN(ts)) // 1000000000 AS BIGINT) AS min_event_s,
         |    CAST(epoch_ns(MAX(ts)) // 1000000000 AS BIGINT) AS max_event_s
         |  FROM events
         |  UNION ALL
         |  SELECT 'lineitem', 'l_shipdate', COUNT(*),
         |    CAST(floor(epoch(MIN(l_shipdate))) AS BIGINT),
         |    CAST(floor(epoch(MAX(l_shipdate))) AS BIGINT)
         |  FROM lineitem
         |  UNION ALL
         |  SELECT 'orders', 'o_orderdate', COUNT(*),
         |    CAST(floor(epoch(MIN(o_orderdate))) AS BIGINT),
         |    CAST(floor(epoch(MAX(o_orderdate))) AS BIGINT)
         |  FROM orders)
         |SELECT source_table, event_time_col, n_rows, min_event_s, max_event_s,
         |  CAST((max_event_s - min_event_s) // 86400 AS BIGINT) AS span_days,
         |  CAST((MAX(max_event_s) OVER () - max_event_s) // 86400 AS BIGINT) AS lag_days,
         |  CASE WHEN (MAX(max_event_s) OVER () - max_event_s) // 86400 <= 30 THEN 'fresh'
         |       WHEN (MAX(max_event_s) OVER () - max_event_s) // 86400 <= 90 THEN 'warn'
         |       ELSE 'error' END AS freshness_status
         |FROM f_legs ORDER BY source_table""".stripMargin),
  )
}
