package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{ClassifierFunctions => Cls, DedupFunctions => D, RelevanceFunctions => R, SamplingFunctions => Sam, SimilarityFunctions => S, TextFunctions => T, UrlFunctions => U}
import graft.ops.{AsOfJoinOps, CrossValidationOps, EventAnalyticsOps, FeatureOps, GraphOps, HistoryOps, MacroOps, RangeJoinOps, SkewOps, ValidationOps}


/** Registry queries: text statistics, quality gates, fingerprinting, fits. Split from the former monolithic
  * Queries.scala (r12) — definitions unchanged.
  */
private[queries] object QueriesText {
  import Q.{money2, prices, pricesSql, revenueDec, t}
  import QHelpers._

  val defs: Seq[QueryDef] = Seq(

    QueryDef("t17_pmi",
      // within-document token-pair PMI (collocation mining) with the
      // df gate ahead of the pair join — exact longs everywhere, one
      // ln rounded to 6dp (the a14 contract).
      (s, dir) => R.pmiPairs(docs(s, dir), "doc_id", "text",
        minDf = 5L, minPairs = 5L),
      Some("""WITH dt AS (
             |  SELECT DISTINCT doc_id AS d,
             |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
             |  FROM documents),
             |dt2 AS (SELECT d, tok FROM dt WHERE tok <> ''),
             |fr AS (SELECT tok, count(*) AS df FROM dt2 GROUP BY 1),
             |k AS (SELECT d, tok, df FROM dt2 JOIN fr USING (tok)
             |      WHERE df >= 5 AND df <= 1000000)
             |SELECT a.tok AS tok_a, b.tok AS tok_b,
             |  min(a.df) AS n_a, min(b.df) AS n_b, count(*) AS n_ab,
             |  round(ln(CAST((SELECT count(DISTINCT doc_id) FROM documents) AS DOUBLE)
             |           * count(*) / (min(a.df) * min(b.df))), 6) AS pmi
             |FROM k a JOIN k b ON a.d = b.d AND a.tok < b.tok
             |GROUP BY 1, 2 HAVING count(*) >= 5 ORDER BY 1, 2""".stripMargin)),

QueryDef("t18_novelty",
      // per-document 3-gram novelty ([[TextFunctions.ngramNovelty]]):
      // the fraction of each doc's distinct shingles appearing nowhere
      // else — the upweight-the-novel curation signal next to the
      // pairwise dedup family. All-integer until one small-denominator
      // division (boundary-free at 6dp by construction).
      (s, dir) => T.ngramNovelty(docs(s, dir), "doc_id", "text", n = 3)
        .orderBy("doc_id"),
      Some("""WITH toks AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk
             |  FROM documents),
             |sh AS (
             |  SELECT doc_id,
             |    CASE WHEN len(tk) - 2 <= 0 THEN [array_to_string(tk, ' ')]
             |         ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
             |                i -> array_to_string(tk[i:i+2], ' '))) END AS shingles
             |  FROM toks),
             |dg AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
             |dg2 AS (SELECT doc_id, g FROM dg WHERE g <> ''),
             |fr AS (SELECT g, count(*) AS df FROM dg2 GROUP BY 1),
             |pd AS (
             |  SELECT doc_id, count(*) AS n_grams,
             |    CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
             |  FROM dg2 JOIN fr USING (g) GROUP BY 1)
             |SELECT d.doc_id, COALESCE(pd.n_grams, 0) AS n_grams,
             |  COALESCE(pd.n_novel, 0) AS n_novel,
             |  CASE WHEN pd.n_grams IS NOT NULL
             |       THEN round(CAST(pd.n_novel AS DOUBLE) / pd.n_grams, 6) END AS novelty
             |FROM documents d LEFT JOIN pd USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

QueryDef("t5_heavy_hitters",
      // boilerplate detection: the 20 most frequent 3-shingles via the
      // native space-saving TypedImperativeAggregate. Run in the EXACT
      // regime (capacity far above the distinct-shingle count, so no
      // counter ever evicts and errors are all 0) — which makes it
      // oracle-checkable against a plain count/top-k; the approximate
      // regime is pinned by TopKFreqSpec's eviction-bound test.
      (s, dir) => {
        val sh = docs(s, dir).select(
          explode(D.wordShingles(col("text"), 3)).as("sh"))
        sh.agg(graft.functions.TopKFreq(col("sh"), k = 20, capacity = 200000).as("top"))
          .selectExpr("inline(top)")
          .select(col("value"), col("count").as("n"), col("error"))
          .orderBy(desc("n"), col("value"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk
             |  FROM documents),
             |sh AS (
             |  SELECT doc_id,
             |    CASE WHEN len(tk) - 2 <= 0 THEN [array_to_string(tk, ' ')]
             |         ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
             |                i -> array_to_string(tk[i:i+2], ' '))) END AS shingles
             |  FROM toks),
             |e AS (SELECT unnest(shingles) AS value FROM sh),
             |agg AS (SELECT value, count(*) AS n FROM e GROUP BY value)
             |SELECT value, n, CAST(0 AS BIGINT) AS error FROM agg
             |ORDER BY n DESC, value LIMIT 20""".stripMargin)),

QueryDef("t1_token_counts",
      (s, dir) => docs(s, dir).select(
        col("doc_id"),
        T.tokenCount(col("text")).as("n_tokens"),
        T.subwordCount(col("text")).as("n_subwords"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
             |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
             |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_subwords
             |FROM documents ORDER BY doc_id""".stripMargin)),

QueryDef("t2_quality",
      (s, dir) => docs(s, dir).select(
        col("doc_id"),
        T.punctRatio(col("text")).as("punct_ratio"),
        T.stopwordRatio(col("text"), T.EnglishStopwords).as("stopword_ratio"),
        T.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id"),
      Some("""WITH b AS (
             |  SELECT doc_id,
             |    CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
             |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok,
             |    CASE WHEN length(text) = 0 THEN 0.0
             |         ELSE CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE) / length(text)
             |         END AS punct_ratio,
             |    CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
             |           x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','this','was','for','on','with','as','at','by'], x))) AS DOUBLE)
             |      / len(regexp_split_to_array(lower(trim(text)), '\s+')) AS stopword_ratio
             |  FROM documents)
             |SELECT doc_id, punct_ratio, stopword_ratio,
             |  (least(CAST(n_tok AS DOUBLE) / 20.0, 1.0) * 0.4
             |   + greatest(0.0, 1.0 - punct_ratio * 4.0) * 0.3
             |   + least(stopword_ratio * 5.0, 1.0) * 0.3) * 100.0 AS quality
             |FROM b ORDER BY doc_id""".stripMargin)),

QueryDef("t3_language_id",
      (s, dir) => docs(s, dir).select(
        col("doc_id"), T.languageId(col("text")).as("lang_id"))
        .orderBy("doc_id"),
      Some("""WITH t AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM documents),
             |h AS (SELECT doc_id,
             |  len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','ein','mit','auf','zu'], x))) AS h_de,
             |  len(list_filter(toks, x -> list_contains(['the','and','of','to','is','in','that','it','was','for'], x))) AS h_en,
             |  len(list_filter(toks, x -> list_contains(['el','la','los','las','es','una','por','para','que','con'], x))) AS h_es,
             |  len(list_filter(toks, x -> list_contains(['le','la','les','et','est','une','pour','dans','que','des'], x))) AS h_fr
             |FROM t)
             |SELECT doc_id,
             |  CASE WHEN greatest(h_de, h_en, h_es, h_fr) <= 0 THEN 'und'
             |       WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
             |       WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
             |       WHEN h_es >= h_fr THEN 'es'
             |       ELSE 'fr' END AS lang_id
             |FROM h ORDER BY doc_id""".stripMargin)),

QueryDef("t4_winnow_fingerprints",
      // md5-based rolling hash so the oracle engine computes identical
      // fingerprints (hex min is lexicographic in both engines); the
      // xxhash64 default is the production path.
      (s, dir) => docs(s, dir).select(
        col("doc_id"),
        size(T.winnowedFingerprints(col("text"), k = 8, window = 4,
          hash = c => md5(c.cast("binary")))).as("n_fingerprints"))
        .orderBy("doc_id"),
      Some("""WITH norm AS (
             |  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
             |  FROM documents),
             |h AS (
             |  SELECT doc_id,
             |    CASE WHEN length(t) - 7 <= 0 THEN [md5(t)]
             |         ELSE list_transform(generate_series(1, length(t) - 7),
             |                i -> md5(substring(t, CAST(i AS INTEGER), 8))) END AS hs
             |  FROM norm),
             |w AS (
             |  SELECT doc_id,
             |    CASE WHEN len(hs) - 3 <= 0 THEN [list_aggregate(hs, 'min')]
             |         ELSE list_transform(generate_series(1, len(hs) - 3),
             |                i -> list_aggregate(hs[i:i+3], 'min')) END AS mins
             |  FROM h)
             |SELECT doc_id, CAST(len(list_distinct(mins)) AS INTEGER) AS n_fingerprints
             |FROM w ORDER BY doc_id""".stripMargin)),

QueryDef("t6_repetition",
      // Gopher/C4-style repetition filter signals: duplicate word and
      // bigram fractions per document. Each fraction is ONE IEEE division
      // of two small exact counts, bit-identical in any engine — no
      // rounding needed.
      (s, dir) => docs(s, dir).select(
        col("doc_id"),
        T.duplicateNgramFraction(col("text"), 1).as("dup_word_frac"),
        T.duplicateNgramFraction(col("text"), 2).as("dup_bigram_frac"))
        .orderBy("doc_id"),
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    string_split_regex(lower(trim(text)), '\s+') AS w
             |  FROM documents),
             |grams AS (
             |  SELECT doc_id, w,
             |    CASE WHEN len(w) < 2 THEN []
             |         ELSE list_transform(generate_series(1, len(w) - 1),
             |                i -> w[i] || ' ' || w[i+1]) END AS bg
             |  FROM toks)
             |SELECT doc_id,
             |  CASE WHEN len(w) = 0 THEN 0.0
             |       ELSE 1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w)
             |  END AS dup_word_frac,
             |  CASE WHEN len(bg) = 0 THEN 0.0
             |       ELSE 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg)
             |  END AS dup_bigram_frac
             |FROM grams ORDER BY doc_id""".stripMargin)),

QueryDef("t7_filter_chain",
      // the C4/Gopher-style corpus filter CHAIN: length, quality,
      // repetition, and language gates composed into one keep decision,
      // with the per-gate flags kept for auditability (a real pipeline
      // reports WHY each document dropped). One projection pass — the
      // gates share the token split and nothing shuffles. Thresholds
      // chosen to split the synthetic corpus non-trivially on every
      // gate. Gate comparisons are on unrounded doubles — safe because
      // t2/t6 pin those chains bit-identical across engines.
      (s, dir) => docs(s, dir).select(col("doc_id"),
          T.tokenCount(col("text")).as("n_tokens"),
          T.qualityScore(col("text")).as("quality"),
          T.duplicateNgramFraction(col("text"), 2).as("dup_bg"),
          T.languageId(col("text")).as("lang_id"))
        .select(col("doc_id"),
          (col("n_tokens") >= 20 && col("n_tokens") <= 1000).as("len_ok"),
          (col("quality") >= 75.0).as("quality_ok"),
          (col("dup_bg") <= 0.05).as("rep_ok"),
          (col("lang_id") === "en").as("lang_ok"))
        .withColumn("keep",
          col("len_ok") && col("quality_ok") && col("rep_ok") && col("lang_ok"))
        .orderBy("doc_id"),
      Some("""WITH b AS (
             |  SELECT doc_id,
             |    CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
             |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok,
             |    CASE WHEN length(text) = 0 THEN 0.0
             |         ELSE CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE) / length(text)
             |         END AS punct_ratio,
             |    CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
             |           x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','this','was','for','on','with','as','at','by'], x))) AS DOUBLE)
             |      / len(regexp_split_to_array(lower(trim(text)), '\s+')) AS stopword_ratio,
             |    regexp_split_to_array(lower(trim(text)), '\s+') AS w
             |  FROM documents),
             |g AS (
             |  SELECT doc_id, n_tok, w,
             |    (least(CAST(n_tok AS DOUBLE) / 20.0, 1.0) * 0.4
             |     + greatest(0.0, 1.0 - punct_ratio * 4.0) * 0.3
             |     + least(stopword_ratio * 5.0, 1.0) * 0.3) * 100.0 AS quality,
             |    CASE WHEN len(w) < 2 THEN 0.0
             |         ELSE 1.0 - CAST(len(list_distinct(list_transform(
             |                  generate_series(1, len(w) - 1), i -> w[i] || ' ' || w[i+1]))) AS DOUBLE)
             |              / (len(w) - 1) END AS dup_bg,
             |    len(list_filter(w, x -> list_contains(['der','die','das','und','ist','nicht','ein','mit','auf','zu'], x))) AS h_de,
             |    len(list_filter(w, x -> list_contains(['the','and','of','to','is','in','that','it','was','for'], x))) AS h_en,
             |    len(list_filter(w, x -> list_contains(['el','la','los','las','es','una','por','para','que','con'], x))) AS h_es,
             |    len(list_filter(w, x -> list_contains(['le','la','les','et','est','une','pour','dans','que','des'], x))) AS h_fr
             |  FROM b),
             |f AS (
             |  SELECT doc_id,
             |    n_tok >= 20 AND n_tok <= 1000 AS len_ok,
             |    quality >= 75.0 AS quality_ok,
             |    dup_bg <= 0.05 AS rep_ok,
             |    (CASE WHEN greatest(h_de, h_en, h_es, h_fr) <= 0 THEN 'und'
             |          WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
             |          WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
             |          WHEN h_es >= h_fr THEN 'es'
             |          ELSE 'fr' END) = 'en' AS lang_ok
             |  FROM g)
             |SELECT doc_id, len_ok, quality_ok, rep_ok, lang_ok,
             |  len_ok AND quality_ok AND rep_ok AND lang_ok AS keep
             |FROM f ORDER BY doc_id""".stripMargin)),

QueryDef("t14_perplexity_buckets",
      // CCNet perplexity bucketing ([[RelevanceFunctions
      // .perplexityBuckets]], Wenzek et al. 2020): every doc scored
      // under the corpus's own bigram LM (the r3 machinery), split at
      // the ln-perplexity tertiles into head/middle/tail — the
      // published keep-head-and-middle filter. Oracle = r3's CTEs +
      // negate/round + quantile_cont cuts + the comparison-count CASE;
      // both sides compare 6dp-rounded values against 6dp-rounded cuts
      // so percentile-interpolation ulps can't flip a label.
      (s, dir) => R.perplexityBuckets(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""WITH tk AS (
             |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
             |  FROM documents),
             |bg AS (
             |  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
             |  FROM tk, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
             |  WHERE len(w) >= 2),
             |c2 AS (SELECT w1, w2, count(*) AS n2 FROM bg GROUP BY 1, 2),
             |c1 AS (SELECT w1, count(*) AS n1 FROM bg GROUP BY 1),
             |sc AS (
             |  SELECT b.doc_id,
             |         avg(ln(CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE))) AS lp
             |  FROM bg b JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
             |  GROUP BY 1),
             |scored AS (
             |  SELECT d.doc_id, round(-coalesce(sc.lp, -20.0), 6) AS log_ppl
             |  FROM documents d LEFT JOIN sc USING (doc_id)),
             |cuts AS (
             |  SELECT quantile_cont(log_ppl, [1.0/3, 2.0/3]) AS cs FROM scored)
             |SELECT doc_id, log_ppl,
             |  CASE len(list_filter(cs, c -> log_ppl > round(c, 6)))
             |    WHEN 0 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail'
             |  END AS ppl_bucket
             |FROM scored, cuts ORDER BY doc_id""".stripMargin)),

QueryDef("t15_gopher_gates",
      // Gopher quality gates ([[TextFunctions.gopherGates]], Rae et al.
      // 2021 A1.1): every MassiveWeb rule's measured signal + verdict
      // per document, `passes` the conjunction — the observability-
      // first shape (see which rule kills what BEFORE dropping). All
      // scan-local expressions; the oracle replays each signal 6dp-
      // rounded and the verdicts compare the rounded values.
      (s, dir) => T.gopherGates(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""WITH tk AS (
             |  SELECT doc_id, text,
             |    list_filter(regexp_split_to_array(lower(trim(coalesce(text, ''))), '\s+'),
             |      t -> len(t) > 0) AS w,
             |    string_split(coalesce(text, ''), chr(10)) AS ls
             |  FROM documents),
             |m AS (
             |  SELECT doc_id,
             |    CAST(len(w) AS BIGINT) AS n_words,
             |    round(CASE WHEN len(w) = 0 THEN 0.0
             |      ELSE CAST(list_sum(list_transform(w, t -> len(t))) AS DOUBLE) / len(w)
             |      END, 6) AS mean_word_len,
             |    round(CASE WHEN len(w) = 0 THEN 0.0
             |      ELSE CAST(len(regexp_extract_all(text, '#'))
             |             + len(regexp_extract_all(text, '\.\.\.'))
             |             + len(regexp_extract_all(text, '…')) AS DOUBLE) / len(w)
             |      END, 6) AS symbol_ratio,
             |    round(CAST(len(list_filter(ls, l -> regexp_matches(l, '^\s*[-*•‣▪]'))) AS DOUBLE)
             |      / len(ls), 6) AS bullet_frac,
             |    round(CAST(len(list_filter(ls, l -> regexp_matches(l, '(\.\.\.|…)\s*$'))) AS DOUBLE)
             |      / len(ls), 6) AS ellipsis_frac,
             |    round(CASE WHEN len(w) = 0 THEN 0.0
             |      ELSE CAST(len(list_filter(w, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE) / len(w)
             |      END, 6) AS alpha_frac,
             |    CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
             |      s -> list_contains(w, s))) AS BIGINT) AS stop_hits
             |  FROM tk)
             |SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
             |  ellipsis_frac, alpha_frac, stop_hits,
             |  (n_words BETWEEN 50 AND 100000
             |   AND mean_word_len BETWEEN 3.0 AND 10.0
             |   AND symbol_ratio <= 0.1
             |   AND bullet_frac <= 0.9
             |   AND ellipsis_frac <= 0.3
             |   AND alpha_frac >= 0.8
             |   AND stop_hits >= 2) AS passes
             |FROM m ORDER BY doc_id""".stripMargin)),

QueryDef("t16_gopher_repetition",
      // Gopher repetition gates ([[TextFunctions.gopherRepetition]],
      // Rae et al. 2021 A1.1 "repetition removal"): duplicate-line
      // fractions, top-{2,3,4}-gram char claims, duplicate-{5..10}-gram
      // char coverage (overlap counted once), paper thresholds. One
      // gram explode for all n; the oracle replays every signal
      // 6dp-rounded and the verdict compares the rounded values.
      (s, dir) => T.gopherRepetition(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""WITH d AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
             |tk AS (
             |  SELECT doc_id, text,
             |    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
             |      t -> len(t) > 0) AS w,
             |    string_split(text, chr(10)) AS ls
             |  FROM d),
             |tot AS (
             |  SELECT doc_id,
             |    coalesce(list_sum(list_transform(w, t -> len(t))), 0) AS tc
             |  FROM tk),
             |lcnt AS (
             |  SELECT doc_id, line, count(*) AS c, len(line) AS ll
             |  FROM (SELECT doc_id, unnest(ls) AS line FROM tk)
             |  GROUP BY doc_id, line),
             |lf AS (
             |  SELECT doc_id, sum(c) AS nl, sum(c*ll) AS lchars,
             |         sum(c-1) AS dl, sum((c-1)*ll) AS dlc
             |  FROM lcnt GROUP BY 1),
             |g AS (
             |  SELECT doc_id, n, pos,
             |         array_to_string(list_slice(w, pos, pos+n-1), ' ') AS gram
             |  FROM (
             |    SELECT tk.doc_id, tk.w, ns.n,
             |           unnest(generate_series(1, len(tk.w) - ns.n + 1)) AS pos
             |    FROM tk, (VALUES (2),(3),(4),(5),(6),(7),(8),(9),(10)) ns(n))),
             |c AS (SELECT doc_id, n, gram, count(*) AS c FROM g GROUP BY 1, 2, 3),
             |top AS (
             |  SELECT doc_id, n, cov FROM (
             |    SELECT doc_id, n, c*(len(gram)-(n-1)) AS cov,
             |           row_number() OVER (PARTITION BY doc_id, n
             |             ORDER BY c*(len(gram)-(n-1)) DESC, gram) AS rn
             |    FROM c WHERE c >= 2 AND n <= 4) WHERE rn = 1),
             |dk AS (SELECT doc_id, n, gram FROM c WHERE c >= 2 AND n >= 5),
             |cp AS (
             |  SELECT DISTINCT doc_id, n, pos + off AS ti FROM (
             |    SELECT g.doc_id, g.n, g.pos,
             |           unnest(generate_series(0, g.n - 1)) AS off
             |    FROM g JOIN dk USING (doc_id, n, gram))),
             |tl AS (
             |  SELECT doc_id, i AS ti, len(w[i]) AS tl FROM (
             |    SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i FROM tk)),
             |dc AS (
             |  SELECT doc_id, n, sum(tl) AS cov
             |  FROM cp JOIN tl USING (doc_id, ti) GROUP BY 1, 2),
             |m AS (
             |  SELECT d.doc_id,
             |    round(CASE WHEN lf.nl > 0 THEN least(1.0, CAST(lf.dl AS DOUBLE)/lf.nl) ELSE 0.0 END, 6) AS dup_line_frac,
             |    round(CASE WHEN lf.lchars > 0 THEN least(1.0, CAST(lf.dlc AS DOUBLE)/lf.lchars) ELSE 0.0 END, 6) AS dup_line_char_frac,
             |    round(CASE WHEN tot.tc > 0 THEN least(1.0, CAST(coalesce(t2.cov, 0) AS DOUBLE)/tot.tc) ELSE 0.0 END, 6) AS top2_char_frac,
             |    round(CASE WHEN tot.tc > 0 THEN least(1.0, CAST(coalesce(t3.cov, 0) AS DOUBLE)/tot.tc) ELSE 0.0 END, 6) AS top3_char_frac,
             |    round(CASE WHEN tot.tc > 0 THEN least(1.0, CAST(coalesce(t4.cov, 0) AS DOUBLE)/tot.tc) ELSE 0.0 END, 6) AS top4_char_frac,
             |    round(CASE WHEN tot.tc > 0 THEN least(1.0, CAST(coalesce(c5.cov, 0) AS DOUBLE)/tot.tc) ELSE 0.0 END, 6) AS dup5_char_frac,
             |    round(CASE WHEN tot.tc > 0 THEN least(1.0, CAST(coalesce(c6.cov, 0) AS DOUBLE)/tot.tc) ELSE 0.0 END, 6) AS dup6_char_frac,
             |    round(CASE WHEN tot.tc > 0 THEN least(1.0, CAST(coalesce(c7.cov, 0) AS DOUBLE)/tot.tc) ELSE 0.0 END, 6) AS dup7_char_frac,
             |    round(CASE WHEN tot.tc > 0 THEN least(1.0, CAST(coalesce(c8.cov, 0) AS DOUBLE)/tot.tc) ELSE 0.0 END, 6) AS dup8_char_frac,
             |    round(CASE WHEN tot.tc > 0 THEN least(1.0, CAST(coalesce(c9.cov, 0) AS DOUBLE)/tot.tc) ELSE 0.0 END, 6) AS dup9_char_frac,
             |    round(CASE WHEN tot.tc > 0 THEN least(1.0, CAST(coalesce(c10.cov, 0) AS DOUBLE)/tot.tc) ELSE 0.0 END, 6) AS dup10_char_frac
             |  FROM d
             |  JOIN lf USING (doc_id) JOIN tot USING (doc_id)
             |  LEFT JOIN top t2 ON t2.doc_id = d.doc_id AND t2.n = 2
             |  LEFT JOIN top t3 ON t3.doc_id = d.doc_id AND t3.n = 3
             |  LEFT JOIN top t4 ON t4.doc_id = d.doc_id AND t4.n = 4
             |  LEFT JOIN dc c5 ON c5.doc_id = d.doc_id AND c5.n = 5
             |  LEFT JOIN dc c6 ON c6.doc_id = d.doc_id AND c6.n = 6
             |  LEFT JOIN dc c7 ON c7.doc_id = d.doc_id AND c7.n = 7
             |  LEFT JOIN dc c8 ON c8.doc_id = d.doc_id AND c8.n = 8
             |  LEFT JOIN dc c9 ON c9.doc_id = d.doc_id AND c9.n = 9
             |  LEFT JOIN dc c10 ON c10.doc_id = d.doc_id AND c10.n = 10)
             |SELECT m.*,
             |  (dup_line_frac <= 0.30 AND dup_line_char_frac <= 0.20
             |   AND top2_char_frac <= 0.20 AND top3_char_frac <= 0.18
             |   AND top4_char_frac <= 0.16 AND dup5_char_frac <= 0.15
             |   AND dup6_char_frac <= 0.14 AND dup7_char_frac <= 0.13
             |   AND dup8_char_frac <= 0.12 AND dup9_char_frac <= 0.11
             |   AND dup10_char_frac <= 0.10) AS passes
             |FROM m ORDER BY doc_id""".stripMargin)),

QueryDef("t13_c4_line_gate",
      // the C4 line gate (Raffel et al. JMLR 2020 §2.2) through the
      // scan-local [[TextFunctions.filterLines]] rewrite: keep only
      // lines ending in terminal punctuation with >= 3 words —
      // nav labels, button stubs, and survey fragments die; prose
      // survives. Planted six-line pages make every branch observable;
      // both engines rebuild the same pages and replay the gate.
      (s, dir) => {
        val d = docs(s, dir).filter(col("doc_id") < 40)
        val planted = d.select(col("doc_id"), concat_ws("\n",
          lit("Home"),
          lit("Read the full story here."),
          lit("Subscribe"),
          concat(col("text"), lit(".")),
          lit("Was this helpful? Yes No"),
          lit("He said \"stop now please.\"")).as("text"))
        T.filterLines(planted, "doc_id", "text", l => T.c4KeepLine(l))
          .orderBy("doc_id")
      },
      Some(("""WITH planted AS (
             |  SELECT doc_id,
             |    'Home' || chr(10) || 'Read the full story here.' || chr(10)
             |      || 'Subscribe' || chr(10) || text || '.' || chr(10)
             |      || 'Was this helpful? Yes No' || chr(10)
             |      || 'He said "stop now please."' AS text
             |  FROM documents WHERE doc_id < 40),
             |lines AS (
             |  SELECT doc_id, generate_subscripts(ls, 1) - 1 AS pos, unnest(ls) AS line
             |  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM planted)),
             |kept AS (
             |  SELECT doc_id, pos, line FROM lines
             |  WHERE regexp_matches(line, '[.!?"QUOTE]\s*$')
             |    AND (CASE WHEN length(trim(line)) = 0 THEN 0
             |              ELSE len(regexp_split_to_array(trim(line), '\s+'))
             |         END) >= 3),
             |rebuilt AS (
             |  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
             |  FROM kept GROUP BY doc_id)
             |SELECT p.doc_id, coalesce(r.text, '') AS text
             |FROM planted p LEFT JOIN rebuilt r USING (doc_id)
             |ORDER BY p.doc_id""").stripMargin.replace("QUOTE", "\u201d"))),

QueryDef("t12_normalize_text",
      // canonical text normalization ([[TextFunctions.normalizeText]]
      // over the native [[NfcNormalize]] expression): NFC composition →
      // lowercase → control-char strip → whitespace collapse → trim.
      // The planted rows make the POINT: "CAFE" + U+0301 (decomposed)
      // and "café" (precomposed) are different byte sequences that
      // normalize to the IDENTICAL string — byte-keyed dedup only works
      // downstream of this pass. Both engines implement Unicode NFC
      // (java.text.Normalizer / utf8proc), so the oracle replays
      // byte-for-byte.
      (s, dir) => docs(s, dir).filter(col("doc_id") < 30)
        .select(col("doc_id"),
          when(col("doc_id") % 3 === 0,
            concat(lit("CAFE"), lit("\u0301"), lit(" LATTE\tMENU  du jour")))
          .when(col("doc_id") % 3 === 1,
            lit("caf\u00e9 latte menu du jour"))
          .otherwise(concat(
            lit("control\u0001chars\u0007here  "), col("text")))
          .as("text"))
        .select(col("doc_id"),
          T.normalizeText(col("text")).as("norm"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  trim(regexp_replace(regexp_replace(
             |    lower(nfc_normalize(
             |      CASE WHEN doc_id % 3 = 0
             |             THEN 'CAFE' || chr(769) || ' LATTE' || chr(9) || 'MENU  du jour'
             |           WHEN doc_id % 3 = 1 THEN 'caf' || chr(233) || ' latte menu du jour'
             |           ELSE 'control' || chr(1) || 'chars' || chr(7) || 'here  ' || text
             |      END)),
             |    '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
             |    '[ \t]+', ' ', 'g')) AS norm
             |FROM documents WHERE doc_id < 30 ORDER BY doc_id""".stripMargin)),

QueryDef("t11_gate_report",
      // Per-source gate observability: how many documents each
      // C4/Gopher-style gate (t7's length / quality / repetition /
      // language thresholds) rejects per crawl source, and how many
      // pass all four — the report a nightly 100 TB clean publishes so
      // a drifting source is caught the day it drifts. ONE fused
      // projection + aggregation pass: the gates share the token split,
      // counts combine map-side onto a handful of source keys, no
      // second scan, no window. Gate comparisons are on unrounded
      // doubles — t2/t6 pin those chains bit-identical across engines.
      (s, dir) => {
        val flags = docs(s, dir).select(col("source"),
            T.tokenCount(col("text")).as("n_tokens"),
            T.qualityScore(col("text")).as("quality"),
            T.duplicateNgramFraction(col("text"), 2).as("dup_bg"),
            T.languageId(col("text")).as("lang_id"))
          .select(col("source"),
            (col("n_tokens") >= 20 && col("n_tokens") <= 1000).as("len_ok"),
            (col("quality") >= 75.0).as("quality_ok"),
            (col("dup_bg") <= 0.05).as("rep_ok"),
            (col("lang_id") === "en").as("lang_ok"))
        def fails(c: Column): Column = sum(when(!c, 1L).otherwise(0L))
        flags.groupBy("source").agg(
            count(lit(1)).as("n_docs"),
            fails(col("len_ok")).as("n_len_fail"),
            fails(col("quality_ok")).as("n_quality_fail"),
            fails(col("rep_ok")).as("n_rep_fail"),
            fails(col("lang_ok")).as("n_lang_fail"),
            sum(when(col("len_ok") && col("quality_ok") && col("rep_ok")
              && col("lang_ok"), 1L).otherwise(0L)).as("n_pass"))
          .orderBy("source")
      },
      Some("""WITH b AS (
             |  SELECT doc_id, source,
             |    CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
             |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok,
             |    CASE WHEN length(text) = 0 THEN 0.0
             |         ELSE CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE) / length(text)
             |         END AS punct_ratio,
             |    CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
             |           x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','this','was','for','on','with','as','at','by'], x))) AS DOUBLE)
             |      / len(regexp_split_to_array(lower(trim(text)), '\s+')) AS stopword_ratio,
             |    regexp_split_to_array(lower(trim(text)), '\s+') AS w
             |  FROM documents),
             |g AS (
             |  SELECT doc_id, source, n_tok, w,
             |    (least(CAST(n_tok AS DOUBLE) / 20.0, 1.0) * 0.4
             |     + greatest(0.0, 1.0 - punct_ratio * 4.0) * 0.3
             |     + least(stopword_ratio * 5.0, 1.0) * 0.3) * 100.0 AS quality,
             |    CASE WHEN len(w) < 2 THEN 0.0
             |         ELSE 1.0 - CAST(len(list_distinct(list_transform(
             |                  generate_series(1, len(w) - 1), i -> w[i] || ' ' || w[i+1]))) AS DOUBLE)
             |              / (len(w) - 1) END AS dup_bg,
             |    len(list_filter(w, x -> list_contains(['der','die','das','und','ist','nicht','ein','mit','auf','zu'], x))) AS h_de,
             |    len(list_filter(w, x -> list_contains(['the','and','of','to','is','in','that','it','was','for'], x))) AS h_en,
             |    len(list_filter(w, x -> list_contains(['el','la','los','las','es','una','por','para','que','con'], x))) AS h_es,
             |    len(list_filter(w, x -> list_contains(['le','la','les','et','est','une','pour','dans','que','des'], x))) AS h_fr
             |  FROM b),
             |f AS (
             |  SELECT source,
             |    n_tok >= 20 AND n_tok <= 1000 AS len_ok,
             |    quality >= 75.0 AS quality_ok,
             |    dup_bg <= 0.05 AS rep_ok,
             |    (CASE WHEN greatest(h_de, h_en, h_es, h_fr) <= 0 THEN 'und'
             |          WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
             |          WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
             |          WHEN h_es >= h_fr THEN 'es'
             |          ELSE 'fr' END) = 'en' AS lang_ok
             |  FROM g)
             |SELECT source, count(*) AS n_docs,
             |  CAST(COALESCE(SUM(CASE WHEN NOT len_ok THEN 1 END), 0) AS BIGINT) AS n_len_fail,
             |  CAST(COALESCE(SUM(CASE WHEN NOT quality_ok THEN 1 END), 0) AS BIGINT) AS n_quality_fail,
             |  CAST(COALESCE(SUM(CASE WHEN NOT rep_ok THEN 1 END), 0) AS BIGINT) AS n_rep_fail,
             |  CAST(COALESCE(SUM(CASE WHEN NOT lang_ok THEN 1 END), 0) AS BIGINT) AS n_lang_fail,
             |  CAST(COALESCE(SUM(CASE WHEN len_ok AND quality_ok AND rep_ok AND lang_ok THEN 1 END), 0) AS BIGINT) AS n_pass
             |FROM f GROUP BY 1 ORDER BY 1""".stripMargin)),

QueryDef("t8_quality_deciles",
      // curriculum binning: quality-score deciles via broadcast exact
      // cut points (never a global ntile sort — see quantileBucket's
      // scaladoc). Values are bit-reproducible chains; cuts are
      // compared 6dp-rounded, so the assignment is engine-portable.
      (s, dir) => Sam.quantileBucket(
          docs(s, dir).select(col("doc_id"),
            T.qualityScore(col("text")).as("quality")),
          "doc_id", "quality", nBuckets = 10)
        .select(col("doc_id"), col("bucket").as("decile"))
        .orderBy("doc_id"),
      Some("""WITH b AS (
             |  SELECT doc_id,
             |    CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
             |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok,
             |    CASE WHEN length(text) = 0 THEN 0.0
             |         ELSE CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE) / length(text)
             |         END AS punct_ratio,
             |    CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
             |           x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','this','was','for','on','with','as','at','by'], x))) AS DOUBLE)
             |      / len(regexp_split_to_array(lower(trim(text)), '\s+')) AS stopword_ratio
             |  FROM documents),
             |q AS (
             |  SELECT doc_id,
             |    (least(CAST(n_tok AS DOUBLE) / 20.0, 1.0) * 0.4
             |     + greatest(0.0, 1.0 - punct_ratio * 4.0) * 0.3
             |     + least(stopword_ratio * 5.0, 1.0) * 0.3) * 100.0 AS quality
             |  FROM b),
             |cuts AS (
             |  SELECT quantile_cont(quality,
             |    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS cs
             |  FROM q)
             |SELECT doc_id,
             |  CAST(len(list_filter(cs, c -> quality > round(c, 6))) AS INTEGER) AS decile
             |FROM q, cuts ORDER BY doc_id""".stripMargin)),

QueryDef("t10_lang_quartiles",
      // per-GROUP curriculum binning: quality quartiles WITHIN each
      // language (a pooled binning would grade every low-resource
      // language against the dominant one's distribution). Cuts reduce
      // per group and join back broadcast; same 6dp-rounded-cut
      // portability contract as t8.
      (s, dir) => Sam.quantileBucketByGroup(
          docs(s, dir).select(col("doc_id"), col("lang"),
            T.qualityScore(col("text")).as("quality")),
          "doc_id", "lang", "quality", nBuckets = 4)
        .select(col("doc_id"), col("lang"), col("bucket").as("quartile"))
        .orderBy("doc_id"),
      Some("""WITH b AS (
             |  SELECT doc_id, lang,
             |    CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
             |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok,
             |    CASE WHEN length(text) = 0 THEN 0.0
             |         ELSE CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE) / length(text)
             |         END AS punct_ratio,
             |    CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
             |           x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','this','was','for','on','with','as','at','by'], x))) AS DOUBLE)
             |      / len(regexp_split_to_array(lower(trim(text)), '\s+')) AS stopword_ratio
             |  FROM documents),
             |q AS (
             |  SELECT doc_id, lang,
             |    (least(CAST(n_tok AS DOUBLE) / 20.0, 1.0) * 0.4
             |     + greatest(0.0, 1.0 - punct_ratio * 4.0) * 0.3
             |     + least(stopword_ratio * 5.0, 1.0) * 0.3) * 100.0 AS quality
             |  FROM b),
             |cuts AS (
             |  SELECT lang, quantile_cont(quality, [0.25, 0.5, 0.75]) AS cs
             |  FROM q GROUP BY lang)
             |SELECT q.doc_id, q.lang,
             |  CAST(len(list_filter(cs, c -> quality > round(c, 6))) AS INTEGER) AS quartile
             |FROM q JOIN cuts ON q.lang = cuts.lang ORDER BY doc_id""".stripMargin)),

QueryDef("t4b_winnow_native",
      // the PRODUCTION winnowing path: the native codegen expression over
      // xxhash64 — one compiled pass per document vs t4's interpreted
      // HOF + per-k-gram md5 (which exists so the oracle engine can
      // recompute it). xxhash64 is Spark-specific → rows-only here;
      // TextFunctionsSpec pins bit-parity with the HOF formulation whose
      // md5 twin t4 hash-matches DuckDB.
      (s, dir) => docs(s, dir).select(
        col("doc_id"),
        size(T.winnowedFingerprintsNative(col("text"), k = 8, window = 4))
          .as("n_fingerprints"))
        .orderBy("doc_id"),
      None),

QueryDef("t9_chunk_documents",
      // fixed-size token windows with 50% overlap (32/16) — the front
      // half of the chunk → embed → pool loop (s5 is the back half).
      // Chunk membership is a pure row function: one projection + an
      // explode, no shuffle, and the oracle re-derives the identical
      // windows from the same token split.
      (s, dir) => T.chunkDocuments(docs(s, dir), "doc_id", "text",
          chunkSize = 32, stride = 16)
        .orderBy("doc_id", "chunk_id"),
      Some("""WITH tk AS (
             |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
             |  FROM documents
             |  WHERE length(trim(text)) > 0)
             |SELECT doc_id, CAST(i AS INTEGER) AS chunk_id,
             |  array_to_string(w[i*16+1 : i*16+32], ' ') AS chunk_text,
             |  CAST(least(32, len(w) - i*16) AS INTEGER) AS n_tokens
             |FROM tk, UNNEST(generate_series(0,
             |  CAST(ceil(greatest(len(w) - 32, 0) / 16.0) AS BIGINT))) AS t(i)
             |ORDER BY doc_id, chunk_id""".stripMargin)),

QueryDef("t19_readability",
      // Flesch reading ease over the documents table
      // ([[graft.functions.TextFunctions.fleschReadingEase]]): words =
      // \S+ runs, sentences = [.!?]+ runs (min 1 when words exist),
      // syllables = [aeiouy]+ vowel groups — every count an exact
      // integer in the Java∩RE2 regex subset, the score one IEEE chain
      // → 6dp round. Projection-only: no join, no shuffle beyond the
      // final order.
      (s, dir) => docs(s, dir).select(
          col("doc_id"),
          T.tokenCount(col("text")).as("words"),
          T.sentenceCount(col("text")).as("sentences"),
          T.syllableCount(col("text")).as("syllables"),
          round(T.fleschReadingEase(col("text")), 6).as("flesch"))
        .orderBy("doc_id"),
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS words,
             |    CASE WHEN text IS NULL THEN NULL
             |         ELSE greatest(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT),
             |                       CASE WHEN len(regexp_extract_all(text, '\S+')) > 0
             |                            THEN 1 ELSE 0 END) END AS sentences,
             |    CASE WHEN text IS NULL THEN NULL
             |         ELSE CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
             |    END AS syllables
             |  FROM documents)
             |SELECT doc_id, words, sentences, syllables,
             |  round(CASE WHEN words = 0 THEN NULL
             |             ELSE 206.835 - 1.015 * (CAST(words AS DOUBLE) / sentences)
             |                          - 84.6 * (CAST(syllables AS DOUBLE) / words)
             |        END, 6) AS flesch
             |FROM m ORDER BY doc_id""".stripMargin)),

QueryDef("t20_zipf",
      // Zipf rank-frequency fit over the documents vocabulary
      // ([[graft.functions.RelevanceFunctions.zipfFit]]): top-100
      // tokens + the OLS line through (ln rank, ln freq). Per-point
      // lns round 6dp (the cls1/a14 libm convention), fit sums
      // accumulate in exact decimal, slope/intercept round 6dp.
      (s, dir) => R.zipfFit(docs(s, dir), "text", topK = 100),
      Some("""WITH tok AS (
             |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
             |  FROM documents WHERE text IS NOT NULL),
             |tok2 AS (SELECT token FROM tok WHERE length(token) > 0),
             |c AS (SELECT token, count(*) AS n FROM tok2 GROUP BY 1),
             |top AS (SELECT token, n FROM c ORDER BY n DESC, token LIMIT 100),
             |rk AS (
             |  SELECT token, n,
             |         CAST(row_number() OVER (ORDER BY n DESC, token) AS INTEGER) AS "rank"
             |  FROM top),
             |pts AS (
             |  SELECT token, n, "rank",
             |         round(ln(CAST("rank" AS DOUBLE)), 6) AS ln_rank,
             |         round(ln(CAST(n AS DOUBLE)), 6) AS ln_freq
             |  FROM rk),
             |sums AS (
             |  SELECT CAST(count(*) AS DOUBLE) AS k,
             |    CAST(SUM(CAST(ln_rank AS DECIMAL(20,6))) AS DOUBLE) AS sx,
             |    CAST(SUM(CAST(ln_freq AS DECIMAL(20,6))) AS DOUBLE) AS sy,
             |    CAST(SUM(CAST(ln_rank * ln_freq AS DECIMAL(24,12))) AS DOUBLE) AS sxy,
             |    CAST(SUM(CAST(ln_rank * ln_rank AS DECIMAL(24,12))) AS DOUBLE) AS sxx
             |  FROM pts),
             |fit AS (
             |  SELECT (k * sxy - sx * sy) / (k * sxx - sx * sx) AS slope,
             |         (sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx) / k AS icept
             |  FROM sums)
             |SELECT "rank", token, n, ln_rank, ln_freq,
             |  round(slope, 6) AS slope, round(icept, 6) AS intercept
             |FROM pts, fit ORDER BY "rank"""".stripMargin)),

QueryDef("t21_concordance",
      // keyword-in-context for 'spark' over the documents table
      // ([[graft.functions.TextFunctions.concordance]]): one row per
      // occurrence with ±3 tokens of context — scan-local, no shuffle.
      (s, dir) => T.concordance(docs(s, dir), "doc_id", "text",
          term = "spark", window = 3)
        .orderBy("doc_id", "pos"),
      Some("""WITH tk AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
             |  FROM documents WHERE text IS NOT NULL),
             |occ AS (
             |  SELECT doc_id, w,
             |         CAST(unnest(list_filter(generate_series(1, len(w)),
             |                                 i -> w[i] = 'spark')) AS INTEGER) AS pos
             |  FROM tk)
             |SELECT doc_id, pos,
             |  COALESCE(array_to_string(w[greatest(pos - 3, 1):pos - 1], ' '), '') AS before,
             |  COALESCE(array_to_string(w[pos + 1:least(pos + 3, len(w))], ' '), '') AS after
             |FROM occ ORDER BY doc_id, pos""".stripMargin)),

QueryDef("t31_token_entropy",
      // per-doc unigram (token) Shannon entropy + the n_types-normalized
      // form: H = ln(n) − Σ c·ln(c) / n over the whitespace-token
      // distribution — the lexical-randomness gate next to t22's
      // type-token ratio (near-zero H = boilerplate/repetition spam,
      // near-ln(types) H = natural prose; both tails feed the quality
      // gates). One explode + two hash aggs; docs with no tokens carry
      // no distribution and drop (the t-family token convention).
      // Final-expression 6dp round absorbs ln ulps and sum order.
      (s, dir) => docs(s, dir)
        .select(col("doc_id"),
          explode(filter(split(lower(trim(col("text"))), "\\s+"),
            t => length(t) > 0)).as("_tok"))
        .groupBy("doc_id", "_tok").agg(count(lit(1)).as("_c"))
        .groupBy("doc_id")
        .agg(sum(col("_c")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          round(log(sum(col("_c")).cast("double")) -
            sum(col("_c").cast("double") * log(col("_c").cast("double"))) /
              sum(col("_c")).cast("double"), 6).as("entropy"))
        .withColumn("norm_entropy",
          when(col("n_types") >= 2,
            round(col("entropy") / log(col("n_types").cast("double")), 6)))
        .orderBy("doc_id"),
      Some("""WITH tk AS (
             |  SELECT doc_id,
             |    unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
             |      t -> len(t) > 0)) AS tok
             |  FROM documents),
             |c AS (SELECT doc_id, tok, count(*) AS c FROM tk GROUP BY 1, 2),
             |h AS (
             |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             |    count(*) AS n_types,
             |    round(ln(CAST(sum(c) AS DOUBLE))
             |      - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
             |        / CAST(sum(c) AS DOUBLE), 6) AS entropy
             |  FROM c GROUP BY 1)
             |SELECT doc_id, n_tokens, n_types, entropy,
             |  CASE WHEN n_types >= 2
             |       THEN round(entropy / ln(CAST(n_types AS DOUBLE)), 6) END
             |    AS norm_entropy
             |FROM h ORDER BY doc_id""".stripMargin)),

QueryDef("t22_sttr",
      // segmental type-token ratio ([[graft.functions.TextFunctions
      // .sttr]], 25-token segments): lexical diversity that doesn't
      // collapse with length — the template-spam signal token-count
      // gates miss. Entirely scan-local (no explode, no shuffle);
      // Σ segment distinct counts are exact ints, ONE division, 6dp.
      (s, dir) => docs(s, dir).select(col("doc_id"),
          T.tokenCount(col("text")).as("n_tokens"),
          T.sttr(col("text"), window = 25).as("sttr"))
        .orderBy("doc_id"),
      Some("""WITH tk AS (
             |  SELECT doc_id, text,
             |    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
             |                t -> length(t) > 0) AS toks
             |  FROM documents),
             |b AS (
             |  SELECT doc_id, text,
             |    CASE WHEN length(trim(text)) = 0 THEN 0
             |         ELSE len(regexp_split_to_array(trim(text), '\s+'))
             |    END AS n_tokens,
             |    toks, len(toks) AS n
             |  FROM tk)
             |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             |  CASE WHEN text IS NULL OR n = 0 THEN NULL
             |       WHEN n < 25 THEN
             |         round(CAST(len(list_distinct(toks)) AS DOUBLE) / n, 6)
             |       ELSE round(CAST(list_aggregate(
             |           list_transform(generate_series(0, n // 25 - 1),
             |             i -> len(list_distinct(toks[i*25+1 : i*25+25]))),
             |           'sum') AS DOUBLE) / ((n // 25) * 25), 6)
             |  END AS sttr
             |FROM b ORDER BY doc_id""".stripMargin)),

QueryDef("t23_heaps_law",
      // Heaps'-law vocabulary growth ([[graft.functions
      // .RelevanceFunctions.heapsFit]]): cumulative vocab vs cumulative
      // tokens in doc order + the (ln N, ln V) OLS fit — the corpus-
      // health twin of t20's Zipf fit, sharing its determinism contract
      // (6dp per-point lns, exact-decimal fit sums, 6dp β/ln K).
      (s, dir) => R.heapsFit(docs(s, dir), "doc_id", "text"),
      Some("""WITH tk AS (
             |  SELECT doc_id,
             |    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
             |  FROM documents WHERE text IS NOT NULL),
             |tk2 AS (SELECT doc_id, token FROM tk WHERE length(token) > 0),
             |pd AS (SELECT doc_id, count(*) AS n_tok FROM tk2 GROUP BY 1),
             |fo AS (SELECT min(doc_id) AS doc_id FROM tk2 GROUP BY token),
             |nw AS (SELECT doc_id, count(*) AS nnew FROM fo GROUP BY 1),
             |pts0 AS (
             |  SELECT pd.doc_id, pd.n_tok, COALESCE(nw.nnew, 0) AS nnew
             |  FROM pd LEFT JOIN nw USING (doc_id)),
             |pts AS (
             |  SELECT doc_id,
             |    CAST(sum(n_tok) OVER w AS BIGINT) AS cum_tokens,
             |    CAST(sum(nnew) OVER w AS BIGINT) AS cum_vocab
             |  FROM pts0
             |  WINDOW w AS (ORDER BY doc_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |p2 AS (
             |  SELECT doc_id, cum_tokens, cum_vocab,
             |    round(ln(CAST(cum_tokens AS DOUBLE)), 6) AS ln_n,
             |    round(ln(CAST(cum_vocab AS DOUBLE)), 6) AS ln_v
             |  FROM pts),
             |sums AS (
             |  SELECT CAST(count(*) AS DOUBLE) AS k,
             |    CAST(SUM(CAST(ln_n AS DECIMAL(20,6))) AS DOUBLE) AS sx,
             |    CAST(SUM(CAST(ln_v AS DECIMAL(20,6))) AS DOUBLE) AS sy,
             |    CAST(SUM(CAST(ln_n * ln_v AS DECIMAL(24,12))) AS DOUBLE) AS sxy,
             |    CAST(SUM(CAST(ln_n * ln_n AS DECIMAL(24,12))) AS DOUBLE) AS sxx
             |  FROM p2),
             |fit AS (
             |  SELECT (k * sxy - sx * sy) / (k * sxx - sx * sx) AS slope,
             |         (sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx) / k
             |           AS icept
             |  FROM sums)
             |SELECT doc_id, cum_tokens, cum_vocab, ln_n, ln_v,
             |  round(slope, 6) AS beta, round(icept, 6) AS ln_k
             |FROM p2, fit ORDER BY doc_id""".stripMargin)),

QueryDef("t24_charclass_profile",
      // per-source character-class composition: letter / digit /
      // whitespace / ASCII-punct / other counts and ratios — the
      // encoding-corruption and boilerplate detector that runs BEFORE
      // tokenization (mojibake shows as an 'other' spike, scraped
      // tables as a digit/punct spike). Classes are EXPLICIT ASCII
      // ranges so Java regex and RE2 agree char-for-char (no \p{Punct}
      // vs [[:punct:]] Unicode-table drift); counts are exact longs
      // (len − len(class removed)), each ratio one division, 6dp.
      (s, dir) => {
        def cnt(c: Column, cls: String) =
          length(c) - length(regexp_replace(c, cls, ""))
        val d = docs(s, dir).filter(col("text").isNotNull)
          .select(col("source"), col("text"))
          .withColumn("_tot", length(col("text")))
          .withColumn("_let", cnt(col("text"), "[A-Za-z]"))
          .withColumn("_dig", cnt(col("text"), "[0-9]"))
          .withColumn("_ws", cnt(col("text"), "[ \\t\\n\\r]"))
          .withColumn("_pun", cnt(col("text"), "[!-/:-@\\[-`{-~]"))
        val wsOverlap = col("_let") + col("_dig") + col("_ws") + col("_pun")
        val a = d.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(col("_tot")).as("n_chars"),
          sum(col("_let")).as("letters"), sum(col("_dig")).as("digits"),
          sum(col("_ws")).as("whitespace"), sum(col("_pun")).as("punct"),
          sum(col("_tot") - wsOverlap).as("other"))
        def ratio(c: String) = round(
          col(c).cast("double") / col("n_chars").cast("double"), 6)
          .as(s"${c}_ratio")
        a.select(col("source"), col("n_docs"), col("n_chars"),
            col("letters"), col("digits"), col("whitespace"), col("punct"),
            col("other"), ratio("letters"), ratio("digits"),
            ratio("whitespace"), ratio("punct"), ratio("other"))
          .orderBy("source")
      },
      Some("""WITH d AS (
             |  SELECT source, length(text) AS tot,
             |    length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS let,
             |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS dig,
             |    length(text) - length(regexp_replace(text, '[ \t\n\r]', '', 'g')) AS ws,
             |    length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')) AS pun
             |  FROM documents WHERE text IS NOT NULL),
             |a AS (
             |  SELECT source, count(*) AS n_docs,
             |    CAST(sum(tot) AS BIGINT) AS n_chars,
             |    CAST(sum(let) AS BIGINT) AS letters,
             |    CAST(sum(dig) AS BIGINT) AS digits,
             |    CAST(sum(ws) AS BIGINT) AS whitespace,
             |    CAST(sum(pun) AS BIGINT) AS punct,
             |    CAST(sum(tot - let - dig - ws - pun) AS BIGINT) AS other
             |  FROM d GROUP BY 1)
             |SELECT source, n_docs, n_chars, letters, digits, whitespace, punct,
             |  other,
             |  round(CAST(letters AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) AS letters_ratio,
             |  round(CAST(digits AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) AS digits_ratio,
             |  round(CAST(whitespace AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) AS whitespace_ratio,
             |  round(CAST(punct AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) AS punct_ratio,
             |  round(CAST(other AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) AS other_ratio
             |FROM a ORDER BY source""".stripMargin)),

QueryDef("t26_boilerplate_lines",
      // boilerplate census: the 20 most document-frequent trimmed lines
      // (≥ 10 chars) across the corpus with doc-frequency share — the
      // report that DECIDES what d14's duplicate-line removal will cut
      // (nav bars and cookie banners surface here first). One explode +
      // distinct + hash agg; top-20 is TakeOrdered with a total
      // (df desc, line) order.
      (s, dir) => {
        val d = docs(s, dir).filter(col("text").isNotNull)
        val nDocs = d.agg(count(lit(1)).as("_n"))
        d.select(col("doc_id"),
            explode(split(col("text"), "\n")).as("_l"))
          .select(col("doc_id"), trim(col("_l")).as("line"))
          .filter(length(col("line")) >= 10)
          .distinct()
          .groupBy("line").agg(count(lit(1)).as("df"))
          .crossJoin(broadcast(nDocs))
          .select(col("line"), col("df"),
            round(col("df").cast("double") / col("_n").cast("double"), 6)
              .as("df_share"))
          .orderBy(col("df").desc, col("line")).limit(20)
      },
      Some("""WITH d AS (SELECT doc_id, text FROM documents
             |          WHERE text IS NOT NULL),
             |n AS (SELECT count(*) AS n FROM d),
             |l AS (
             |  SELECT DISTINCT doc_id, trim(unnest(string_split(text, chr(10))))
             |    AS line
             |  FROM d),
             |f AS (SELECT line, count(*) AS df FROM l
             |      WHERE length(line) >= 10 GROUP BY 1)
             |SELECT line, df,
             |  round(CAST(df AS DOUBLE) / CAST(n.n AS DOUBLE), 6) AS df_share
             |FROM f CROSS JOIN n
             |ORDER BY df DESC, line LIMIT 20""".stripMargin)),

QueryDef("t27_mixed_language",
      // code-switching / concatenation detector: language-ID per t9
      // CHUNK, then per-document disagreement — a doc whose chunks
      // vote for different languages is usually two pages glued by the
      // extractor (t3's whole-doc vote hides it; chunk-level voting is
      // how fastText-based cleaners catch it). Majority pick ties to
      // the lexicographically smaller language via min(struct(−m,
      // lang)) — all-integer; one explode + two hash aggs.
      (s, dir) => {
        val ch = T.chunkDocuments(docs(s, dir), "doc_id", "text",
            chunkSize = 32, stride = 16)
          .select(col("doc_id"), T.languageId(col("chunk_text")).as("cl"))
        val per = ch.groupBy("doc_id", "cl").agg(count(lit(1)).as("_m"))
        per.groupBy("doc_id").agg(
            sum(col("_m")).as("n_chunks"),
            count(lit(1)).as("n_langs"),
            min(struct((-col("_m")).as("nm"), col("cl").as("l"))).as("_mj"))
          .select(col("doc_id"), col("n_chunks"), col("n_langs"),
            col("_mj.l").as("majority_lang"),
            round((-col("_mj.nm")).cast("double") /
              col("n_chunks").cast("double"), 6).as("majority_share"),
            (col("n_langs") > 1).as("mixed"))
          .orderBy("doc_id")
      },
      Some("""WITH tk AS (
             |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
             |  FROM documents
             |  WHERE length(trim(text)) > 0),
             |ch AS (
             |  SELECT doc_id,
             |    array_to_string(w[i*16+1 : i*16+32], ' ') AS chunk_text
             |  FROM tk, UNNEST(generate_series(0,
             |    CAST(ceil(greatest(len(w) - 32, 0) / 16.0) AS BIGINT))) AS t(i)),
             |ct AS (
             |  SELECT doc_id,
             |    regexp_split_to_array(lower(trim(chunk_text)), '\s+') AS toks
             |  FROM ch),
             |h AS (SELECT doc_id,
             |  len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','ein','mit','auf','zu'], x))) AS h_de,
             |  len(list_filter(toks, x -> list_contains(['the','and','of','to','is','in','that','it','was','for'], x))) AS h_en,
             |  len(list_filter(toks, x -> list_contains(['el','la','los','las','es','una','por','para','que','con'], x))) AS h_es,
             |  len(list_filter(toks, x -> list_contains(['le','la','les','et','est','une','pour','dans','que','des'], x))) AS h_fr
             |FROM ct),
             |lid AS (
             |  SELECT doc_id,
             |    CASE WHEN greatest(h_de, h_en, h_es, h_fr) <= 0 THEN 'und'
             |         WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
             |         WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
             |         WHEN h_es >= h_fr THEN 'es'
             |         ELSE 'fr' END AS cl
             |  FROM h),
             |per AS (SELECT doc_id, cl, count(*) AS m FROM lid GROUP BY 1, 2)
             |SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_chunks,
             |  count(*) AS n_langs,
             |  (min({'nm': -m, 'l': cl})).l AS majority_lang,
             |  round(CAST(-(min({'nm': -m, 'l': cl})).nm AS DOUBLE)
             |    / CAST(sum(m) AS DOUBLE), 6) AS majority_share,
             |  (count(*) > 1) AS mixed
             |FROM per GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

QueryDef("t28_template_prefixes",
      // template detection by OPENING-LINE fingerprint: documents
      // grouped by their first 8 normalized tokens; groups with > 1
      // member are template families (form letters, generated pages —
      // the d1 exact-dup key misses them when bodies differ). Top-10
      // families by size with an example doc id (deterministic min).
      // One projection + hash agg; all-integer.
      (s, dir) => {
        val p = docs(s, dir).filter(col("text").isNotNull)
          .select(col("doc_id"),
            array_join(slice(split(lower(trim(col("text"))), "\\s+"),
              lit(1), lit(8)), " ").as("prefix"))
        p.groupBy("prefix")
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("example_doc"))
          .filter(col("n_docs") > 1)
          .orderBy(col("n_docs").desc, col("prefix")).limit(10)
      },
      Some("""WITH p AS (
             |  SELECT doc_id,
             |    array_to_string(
             |      (regexp_split_to_array(lower(trim(text)), '\s+'))[1:8], ' ')
             |      AS prefix
             |  FROM documents WHERE text IS NOT NULL),
             |g AS (
             |  SELECT prefix, count(*) AS n_docs,
             |         CAST(min(doc_id) AS BIGINT) AS example_doc
             |  FROM p GROUP BY 1)
             |SELECT prefix, n_docs, example_doc FROM g
             |WHERE n_docs > 1
             |ORDER BY n_docs DESC, prefix LIMIT 10""".stripMargin)),

QueryDef("t29_source_style_jsd",
      // per-source style fingerprint: Jensen–Shannon divergence of the
      // source's char-TRIGRAM distribution against the whole corpus —
      // the encoding/style outlier-feed detector (a feed of mojibake or
      // another language juts out before any tokenizer runs). The mix2
      // determinism contract: Laplace-smoothed over the corpus trigram
      // vocabulary, 6dp per-term contributions summed in exact decimal.
      // Vocabulary is trigram-cardinality (bounded by charset³), never
      // corpus-sized.
      (s, dir) => {
        val tri = graft.Caches.trackedPersist(docs(s, dir)
          .filter(col("text").isNotNull)
          .select(col("source"),
            explode(expr("transform(sequence(1, greatest(length(text) - 2, 0)), " +
              "i -> substring(text, i, 3))")).as("g")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val corpus = tri.groupBy("g").agg(count(lit(1)).as("_cq"))
        val srcTot = tri.groupBy("source").agg(count(lit(1)).as("_ts"))
        val corpTot = tri.agg(count(lit(1)).as("_tc"),
          countDistinct(col("g")).as("_v"))
        val cells = tri.groupBy("source", "g").agg(count(lit(1)).as("_cp"))
        // every source scores over the FULL vocabulary (zero cells
        // still carry smoothed mass): sources × vocab grid
        val grid = srcTot.crossJoin(corpus)
          .join(cells, Seq("source", "g"), "left")
          .withColumn("_cp", coalesce(col("_cp"), lit(0L)))
          .crossJoin(broadcast(corpTot))
        val p = (col("_cp").cast("double") + 1.0) /
          (col("_ts") + col("_v")).cast("double")
        val q = (col("_cq").cast("double") + 1.0) /
          (col("_tc") + col("_v")).cast("double")
        val m = (p + q) / 2.0
        val term = round((p * log(p / m) + q * log(q / m)) / 2.0, 6)
          .cast("decimal(20,6)")
        grid.groupBy("source")
          .agg(sum(col("_cp")).as("n_trigrams"),
            sum(term).cast("double").as("jsd_to_corpus"))
          .orderBy("source")
      },
      Some("""WITH tri AS (
             |  SELECT source,
             |    unnest(list_transform(generate_series(1,
             |      greatest(length(text) - 2, 0)), i -> text[i:i+2])) AS g
             |  FROM documents WHERE text IS NOT NULL),
             |cq AS (SELECT g, count(*) AS cq FROM tri GROUP BY 1),
             |ts AS (SELECT source, count(*) AS tsn FROM tri GROUP BY 1),
             |tc AS (SELECT count(*) AS tcn, count(DISTINCT g) AS v FROM tri),
             |cp AS (SELECT source, g, count(*) AS cp FROM tri GROUP BY 1, 2),
             |grid AS (
             |  SELECT ts.source, cq.g, ts.tsn, cq.cq,
             |         COALESCE(cp.cp, 0) AS cp
             |  FROM ts CROSS JOIN cq
             |  LEFT JOIN cp ON cp.source = ts.source AND cp.g = cq.g),
             |t AS (
             |  SELECT source, cp,
             |    CAST(round((p * ln(p / mm) + q * ln(q / mm)) / 2.0, 6)
             |      AS DECIMAL(20,6)) AS term
             |  FROM (
             |    SELECT grid.source, grid.cp,
             |      (CAST(grid.cp AS DOUBLE) + 1.0)
             |        / CAST(grid.tsn + tc.v AS DOUBLE) AS p,
             |      (CAST(grid.cq AS DOUBLE) + 1.0)
             |        / CAST(tc.tcn + tc.v AS DOUBLE) AS q,
             |      ((CAST(grid.cp AS DOUBLE) + 1.0)
             |        / CAST(grid.tsn + tc.v AS DOUBLE)
             |       + (CAST(grid.cq AS DOUBLE) + 1.0)
             |        / CAST(tc.tcn + tc.v AS DOUBLE)) / 2.0 AS mm
             |    FROM grid CROSS JOIN tc))
             |SELECT source, CAST(sum(cp) AS BIGINT) AS n_trigrams,
             |  CAST(SUM(term) AS DOUBLE) AS jsd_to_corpus
             |FROM t GROUP BY 1 ORDER BY source""".stripMargin)),

    QueryDef("t32_self_bleu",
      // self-BLEU-2 diversity audit ([[graft.functions.TextFunctions
      // .selfBleu2]]; Zhu et al. SIGIR 2018): every document scored as
      // a BLEU-2 candidate against all OTHER documents — the
      // mode-collapse / boilerplate localizer next to t18's novelty.
      // Exact without all-pairs: per gram (max, #max-holders,
      // runner-up) decide each doc's clipping reference; per-level
      // work is hash aggs + equi-joins on the gram key only.
      (s, dir) => T.selfBleu2(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""WITH tk AS (
             |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
             |  FROM documents),
             |uni AS (
             |  SELECT doc_id, g FROM (SELECT doc_id, unnest(w) AS g FROM tk)
             |  WHERE length(g) > 0),
             |bg AS (
             |  SELECT doc_id, w[i] || ' ' || w[i+1] AS g
             |  FROM tk, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
             |  WHERE len(w) >= 2),
             |u1 AS (SELECT doc_id, g, count(*) AS c FROM uni GROUP BY 1, 2),
             |us AS (SELECT g, max(c) AS m1 FROM u1 GROUP BY 1),
             |ut AS (
             |  SELECT u.g, max(s.m1) AS m1,
             |    sum(CASE WHEN u.c = s.m1 THEN 1 ELSE 0 END) AS n1,
             |    max(CASE WHEN u.c < s.m1 THEN u.c END) AS m2
             |  FROM u1 u JOIN us s USING (g) GROUP BY u.g),
             |up AS (
             |  SELECT u.doc_id,
             |    round(CAST(sum(least(u.c,
             |        CASE WHEN u.c = t.m1 AND t.n1 = 1
             |             THEN coalesce(t.m2, 0) ELSE t.m1 END)) AS DOUBLE)
             |      / CAST(sum(u.c) AS DOUBLE), 6) AS p1
             |  FROM u1 u JOIN ut t USING (g) GROUP BY 1),
             |b1 AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
             |bs AS (SELECT g, max(c) AS m1 FROM b1 GROUP BY 1),
             |bt AS (
             |  SELECT u.g, max(s.m1) AS m1,
             |    sum(CASE WHEN u.c = s.m1 THEN 1 ELSE 0 END) AS n1,
             |    max(CASE WHEN u.c < s.m1 THEN u.c END) AS m2
             |  FROM b1 u JOIN bs s USING (g) GROUP BY u.g),
             |bp AS (
             |  SELECT u.doc_id,
             |    round(CAST(sum(least(u.c,
             |        CASE WHEN u.c = t.m1 AND t.n1 = 1
             |             THEN coalesce(t.m2, 0) ELSE t.m1 END)) AS DOUBLE)
             |      / CAST(sum(u.c) AS DOUBLE), 6) AS p2
             |  FROM b1 u JOIN bt t USING (g) GROUP BY 1)
             |SELECT d.doc_id, up.p1, bp.p2,
             |  round(sqrt(up.p1 * bp.p2), 6) AS self_bleu2
             |FROM documents d LEFT JOIN up USING (doc_id)
             |                 LEFT JOIN bp USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    QueryDef("t33_vocab_curve",
      // tokenizer-design sweep: corpus token total, type vocabulary and
      // compression ratio at merge counts 0/2/4/6/8 of the learned BPE
      // — the "how many merges buy how much compression" curve a
      // tokenizer budget decision actually reads (diminishing returns
      // show as the flattening tail), next to t30's equity audit. One
      // bounded train (bpe1's 8 scans), then one scan-local native
      // encode + explode-agg per level over the shared merge prefix;
      // the 5-row per-level frame pins so the compression base does
      // not recompute the scans. The oracle replays every merge level
      // from the chained-replace CTEs bpe1/bpe2 already cross-check.
      (s, dir) => {
        val d = docs(s, dir)
        val merges = graft.functions.BpeFunctions
          .train(d, "text", numMerges = 8)
          .orderBy("rank").collect() // 8 rows — bounded by construction
          .map(r => (r.getString(1), r.getString(2))).toSeq
        val perLevel = Seq(0, 2, 4, 6, 8).map { k =>
          graft.functions.BpeFunctions.encode(d, "doc_id", "text", merges.take(k))
            .select(explode(col("tokens")).as("_tok"))
            .agg(count(lit(1)).as("total_tokens"),
              countDistinct(col("_tok")).as("vocab_size"))
            .select(lit(k).as("n_merges"), col("total_tokens"), col("vocab_size"))
        }.reduce(_.unionByName(_))
        val pinned = graft.Caches.trackedPersist(perLevel,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val base = pinned.filter(col("n_merges") === 0)
          .select(col("total_tokens").cast("double").as("_t0"))
        pinned.crossJoin(broadcast(base))
          .select(col("n_merges"), col("total_tokens"), col("vocab_size"),
            round(col("total_tokens").cast("double") / col("_t0"), 6)
              .as("compression"))
          .orderBy("n_merges")
      },
      Some {
        val S = graft.functions.BpeFunctions.Sep
        def toks(k: Int) =
          s"(SELECT unnest(string_split(trim(enc, '$S'), '$S$S')) AS tok FROM enc$k WHERE enc <> '')"
        val levels = Seq(0, 2, 4, 6, 8).map(k =>
          s"""SELECT $k AS n_merges, count(*) AS total_tokens,
             |       count(DISTINCT tok) AS vocab_size FROM ${toks(k)}""".stripMargin)
          .mkString("\nUNION ALL\n")
        QHelpers.bpeOracle(8,
          s"""SELECT n_merges, total_tokens, vocab_size,
             |  round(CAST(total_tokens AS DOUBLE) /
             |    (SELECT CAST(count(*) AS DOUBLE) FROM ${toks(0)}), 6)
             |    AS compression
             |FROM (
             |$levels
             |) ORDER BY n_merges""".stripMargin)
      })
  )
}
