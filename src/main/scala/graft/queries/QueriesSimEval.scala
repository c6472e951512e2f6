package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{ClassifierFunctions => Cls, DedupFunctions => D, RelevanceFunctions => R, SamplingFunctions => Sam, SimilarityFunctions => S, TextFunctions => T, UrlFunctions => U}
import graft.ops.{AsOfJoinOps, CrossValidationOps, EventAnalyticsOps, FeatureOps, GraphOps, HistoryOps, MacroOps, RangeJoinOps, SkewOps, ValidationOps}


/** Registry queries: similarity search / ANN and classifier-retrieval evaluation. Split from the former monolithic
  * Queries.scala (r12) — definitions unchanged.
  */
private[queries] object QueriesSimEval {
  import Q.{money2, prices, pricesSql, revenueDec, t}
  import QHelpers._

  private val s11OracleSql: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cb AS (
      |  SELECT s.subspace, CAST(c.vec_id AS INTEGER) AS code,
      |         list_slice(c.v, s.subspace * 8 + 1, s.subspace * 8 + 8) AS centroid_vec
      |  FROM e c, generate_series(0, 7) AS s(subspace)
      |  WHERE c.vec_id < 4),
      |enc AS (
      |  SELECT vec_id, subspace, centroid_vec FROM (
      |    SELECT e.vec_id, cb.subspace, cb.centroid_vec,
      |           row_number() OVER (PARTITION BY e.vec_id, cb.subspace
      |             ORDER BY list_distance(
      |               list_slice(e.v, cb.subspace * 8 + 1, cb.subspace * 8 + 8),
      |               cb.centroid_vec), cb.code) AS rn
      |    FROM e, cb) WHERE rn = 1),
      |recon AS (
      |  SELECT vec_id, flatten(list(centroid_vec ORDER BY subspace)) AS rv
      |  FROM enc GROUP BY vec_id),
      |cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 4),
      |cell AS (
      |  SELECT vec_id, cid FROM (
      |    SELECT e.vec_id, c.cid,
      |           row_number() OVER (PARTITION BY e.vec_id
      |             ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
      |    FROM e, cents c) WHERE rn = 1),
      |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
      |probe AS (
      |  SELECT query_id, cid FROM (
      |    SELECT q.query_id, c.cid,
      |           row_number() OVER (PARTITION BY q.query_id
      |             ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.cid) AS rn
      |    FROM q, cents c) WHERE rn <= 2),
      |scored AS (
      |  SELECT q.query_id, r.vec_id,
      |         round(list_cosine_similarity(r.rv, q.qv), 6) AS cosine
      |  FROM recon r
      |  JOIN cell ON cell.vec_id = r.vec_id
      |  JOIN probe p ON p.cid = cell.cid
      |  JOIN q ON q.query_id = p.query_id
      |  WHERE r.vec_id <> q.query_id),
      |ranked AS (
      |  SELECT query_id, vec_id, cosine,
      |         CAST(row_number() OVER (PARTITION BY query_id
      |           ORDER BY cosine DESC, vec_id) AS INTEGER) AS "rank"
      |  FROM scored)
      |SELECT query_id, vec_id, cosine, "rank" FROM ranked
      |WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin


  /** Oracle for `s24_ivfpq_residual` — s11's replay with IVFADC-proper
    * RESIDUAL encoding: assign cells first, PQ-encode v − centroid(cell)
    * against the fixed codebooks, reconstruct x̂ = centroid + r̂, score
    * round(cos(x̂, q), 6) over the probed cells (the direct-cosine form;
    * the Spark kernel's LUT decomposition lands on the same 6dp value —
    * the pqTopK replay convention).
    */
  private val s24OracleSql: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cb AS (
      |  SELECT s.subspace, CAST(c.vec_id AS INTEGER) AS code,
      |         list_slice(c.v, s.subspace * 8 + 1, s.subspace * 8 + 8) AS centroid_vec
      |  FROM e c, generate_series(0, 7) AS s(subspace)
      |  WHERE c.vec_id < 4),
      |cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 4),
      |cell AS (
      |  SELECT vec_id, cid FROM (
      |    SELECT e.vec_id, c.cid,
      |           row_number() OVER (PARTITION BY e.vec_id
      |             ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
      |    FROM e, cents c) WHERE rn = 1),
      |res AS (
      |  SELECT e.vec_id, cell.cid,
      |         list_transform(generate_series(1, 64),
      |           i -> e.v[i] - c.cv[i]) AS r
      |  FROM e JOIN cell USING (vec_id) JOIN cents c ON cell.cid = c.cid),
      |enc AS (
      |  SELECT vec_id, subspace, centroid_vec FROM (
      |    SELECT res.vec_id, cb.subspace, cb.centroid_vec,
      |           row_number() OVER (PARTITION BY res.vec_id, cb.subspace
      |             ORDER BY list_distance(
      |               list_slice(res.r, cb.subspace * 8 + 1, cb.subspace * 8 + 8),
      |               cb.centroid_vec), cb.code) AS rn
      |    FROM res, cb) WHERE rn = 1),
      |recon AS (
      |  SELECT r.vec_id, r.cid,
      |         list_transform(generate_series(1, 64),
      |           i -> c.cv[i] + rr.rhat[i]) AS xhat
      |  FROM res r
      |  JOIN cents c ON r.cid = c.cid
      |  JOIN (SELECT vec_id, flatten(list(centroid_vec ORDER BY subspace)) AS rhat
      |        FROM enc GROUP BY vec_id) rr USING (vec_id)),
      |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
      |probe AS (
      |  SELECT query_id, cid FROM (
      |    SELECT q.query_id, c.cid,
      |           row_number() OVER (PARTITION BY q.query_id
      |             ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.cid) AS rn
      |    FROM q, cents c) WHERE rn <= 2),
      |scored AS (
      |  SELECT q.query_id, r.vec_id,
      |         round(list_cosine_similarity(r.xhat, q.qv), 6) AS cosine
      |  FROM recon r
      |  JOIN probe p ON p.cid = r.cid
      |  JOIN q ON q.query_id = p.query_id
      |  WHERE r.vec_id <> q.query_id),
      |ranked AS (
      |  SELECT query_id, vec_id, cosine,
      |         CAST(row_number() OVER (PARTITION BY query_id
      |           ORDER BY cosine DESC, vec_id) AS INTEGER) AS "rank"
      |  FROM scored)
      |SELECT query_id, vec_id, cosine, "rank" FROM ranked
      |WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    QueryDef("s24_ivfpq_residual",
      // IVFADC proper ([[SimilarityFunctions.ivfPqIndexResidual]] /
      // [[ivfPqTopKResidual]], Jégou et al. TPAMI 2011 §III): s11's
      // pipeline with the codes meaning RESIDUALS v − centroid(cell) —
      // the same m×codes budget quantizes the within-cell ball instead
      // of the whole corpus, the accuracy step production IVF-PQ
      // actually deploys. Search reconstructs x̂ = centroid + r̂
      // entirely from lookup tables (query LUT + per-cell codebook dot
      // table + static norms) — the scan still never reads a raw
      // vector. Same fixed centroids/codebooks as s11, so the oracle
      // replays assignment, residual encoding, reconstruction, probing
      // and scoring end-to-end.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val cb = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").cast("int").as("code"),
            col("embedding").cast("array<double>").as("v"))
          .select(explode(sequence(lit(0), lit(7))).as("subspace"),
            col("code"), col("v"))
          .select(col("subspace"), col("code"),
            slice(col("v"), col("subspace") * 8 + 1, lit(8)).as("centroid_vec"))
        val cents = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").as("centroid_id"),
            col("embedding").cast("array<double>").as("centroid_vec"))
        val idx = S.ivfPqIndexResidual(emb, cents, cb, dim = 64, m = 8, codes = 4)
        val q = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        S.ivfPqTopKResidual(idx, q, cents, cb, dim = 64, m = 8, codes = 4,
            k = 5, nProbe = 2)
          .orderBy("query_id", "rank")
      },
      Some(s24OracleSql)),

    QueryDef("er1_entity_resolution",
      // end-to-end entity resolution composed from the session's parts:
      // block+score (d24's jaroWinklerPairs) → transitive closure
      // (connectedComponents — A~B, B~C merge even when (A,C) never
      // scored) → one canonical entity id per cluster (the component's
      // min member; unmatched records stay their own entity). The
      // per-entity roll-up counts merged records — the dedup-rate
      // report a mastering pipeline ships. Oracle replays pairs
      // verbatim then closes them with a recursive CTE.
      (s, dir) => {
        val titles = docs(s, dir).filter(col("doc_id") < 60)
          .select(col("doc_id"),
            when(col("doc_id") % 4 === 0,
              concat(lit("stochastic gradient descent overview "),
                expr("doc_id div 4")))
            .when(col("doc_id") % 4 === 1,
              concat(lit("stochastic gradient descent overviev "),
                expr("doc_id div 4")))
            .when(col("doc_id") % 4 === 2,
              concat(lit("complete treatise on offshore sailing "),
                expr("doc_id div 4")))
            .otherwise(
              concat(lit("cmplete treatise on offshore sailng "),
                expr("doc_id div 4")))
            .as("title"))
        val pairs = D.jaroWinklerPairs(titles, "doc_id", "title",
          threshold = 0.9, q = 3, maxDf = 50L)
        val cc = D.connectedComponents(pairs)
        titles.join(cc, titles("doc_id") === cc("id"), "left")
          .select(col("doc_id"),
            coalesce(col("component"), col("doc_id")).as("entity_id"))
          .groupBy("entity_id")
          .agg(count(lit(1)).as("n_records"), max(col("doc_id")).as("max_doc"))
          .orderBy("entity_id")
      },
      Some("""WITH RECURSIVE titles AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 4 = 0
             |           THEN 'stochastic gradient descent overview ' || CAST(doc_id // 4 AS VARCHAR)
             |         WHEN doc_id % 4 = 1
             |           THEN 'stochastic gradient descent overviev ' || CAST(doc_id // 4 AS VARCHAR)
             |         WHEN doc_id % 4 = 2
             |           THEN 'complete treatise on offshore sailing ' || CAST(doc_id // 4 AS VARCHAR)
             |         ELSE 'cmplete treatise on offshore sailng ' || CAST(doc_id // 4 AS VARCHAR)
             |    END AS title
             |  FROM documents WHERE doc_id < 60),
             |g0 AS (
             |  SELECT doc_id, length(title) AS len, unnest(
             |    CASE WHEN length(title) <= 3 THEN [title]
             |         ELSE list_distinct(list_transform(
             |           generate_series(1, length(title) - 2),
             |           i -> substr(title, i, 3))) END) AS g
             |  FROM titles),
             |oc AS (SELECT g FROM g0 GROUP BY g HAVING count(*) > 50),
             |gf AS (SELECT g0.* FROM g0 LEFT JOIN oc USING (g) WHERE oc.g IS NULL),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM gf a JOIN gf b ON a.g = b.g
             |  WHERE a.doc_id < b.doc_id
             |    AND least(a.len, b.len) * 1.0 / greatest(a.len, b.len) >= 0.5),
             |pairs AS (
             |  SELECT c.id_a, c.id_b FROM cand c
             |  JOIN titles ta ON ta.doc_id = c.id_a
             |  JOIN titles tb ON tb.doc_id = c.id_b
             |  WHERE jaro_winkler_similarity(ta.title, tb.title) >= 0.9),
             |edges AS (
             |  SELECT id_a AS src, id_b AS dst FROM pairs
             |  UNION SELECT id_b, id_a FROM pairs),
             |reach(id, r) AS (
             |  SELECT src, src FROM edges
             |  UNION
             |  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
             |cc AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
             |SELECT COALESCE(cc.component, t.doc_id) AS entity_id,
             |  count(*) AS n_records, max(t.doc_id) AS max_doc
             |FROM titles t LEFT JOIN cc ON t.doc_id = cc.id
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

QueryDef("s5_mean_pooling",
      // chunk→document embedding pooling: vec_id div 10 groups 10 chunk
      // vectors per pseudo-document; per-dimension means via the
      // explode + hash-agg shape (no vector ever buffered per group).
      // Rounded to 6dp: the 10-term sums are order-insensitive at that
      // precision (same contract as every float aggregate here).
      (s, dir) => S.meanPoolFlat(
          t(s, dir, "embeddings")
            .select(expr("vec_id div 10").as("doc_id"), col("embedding")),
          "doc_id", "embedding")
        .select(col("doc_id"), col("pos"), round(col("mean_v"), 6).as("mean_v"))
        .orderBy("doc_id", "pos"),
      Some("""WITH e AS (
             |  SELECT vec_id // 10 AS doc_id,
             |         CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings),
             |flat AS (
             |  SELECT doc_id, generate_subscripts(v, 1) - 1 AS pos,
             |         unnest(v) AS val
             |  FROM e)
             |SELECT doc_id, CAST(pos AS INTEGER) AS pos,
             |       round(avg(val), 6) AS mean_v
             |FROM flat GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

QueryDef("s4_quantized_knn",
      // exact KNN over the int8-QUANTIZED corpus: 4x/8x smaller vectors,
      // searched directly (cosine is scale-invariant, VecCosine widens
      // bytes) — the memory-bound 100 TB regime. FULLY oracled: the
      // quantization is deterministic double arithmetic (scale =
      // max|x|/127 floored at 1e-30; round is half-away-from-zero in
      // both engines), and the quantized dot products are sums of
      // integer products < 2^53 — EXACT in double — so the only FP in
      // the cosine is the final sqrt/divide, identical IEEE ops in both
      // engines, absorbed by the same 6 dp pre-rank rounding s1 uses.
      // SimilarityFunctionsSpec additionally bounds the round-trip
      // error and recall@5 against the exact s1 results.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val corpus = emb.select(col("vec_id"),
          S.quantizeInt8(col("embedding")).getField("q").as("embedding"))
        val q = corpus.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        S.bruteForceTopK(corpus, q, 5).orderBy("query_id", "rank")
      },
      Some("""WITH qz AS (
             |  SELECT vec_id,
             |         list_transform(CAST(embedding AS DOUBLE[]),
             |           x -> round(x / (greatest(list_max(list_transform(
             |                  CAST(embedding AS DOUBLE[]), y -> abs(y))), 1e-30) / 127.0))) AS qv
             |  FROM embeddings),
             |q AS (SELECT vec_id AS query_id, qv AS query_vec FROM qz WHERE vec_id < 8),
             |scored AS (
             |  SELECT q.query_id, e.vec_id,
             |         round(list_cosine_similarity(e.qv, q.query_vec), 6) AS cosine
             |  FROM qz e, q WHERE e.vec_id <> q.query_id),
             |ranked AS (
             |  SELECT query_id, vec_id, cosine,
             |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS INTEGER) AS "rank"
             |  FROM scored)
             |SELECT query_id, vec_id, cosine, "rank" FROM ranked
             |WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin)),

QueryDef("s1_knn_topk",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        S.bruteForceTopK(emb, q, 5).orderBy("query_id", "rank")
      },
      Some("""WITH q AS (
             |  SELECT vec_id AS query_id, embedding AS query_vec
             |  FROM embeddings WHERE vec_id < 8),
             |scored AS (
             |  SELECT q.query_id, e.vec_id,
             |         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
             |                                      CAST(q.query_vec AS DOUBLE[])), 6) AS cosine
             |  FROM embeddings e, q WHERE e.vec_id <> q.query_id),
             |ranked AS (
             |  SELECT query_id, vec_id, cosine,
             |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS INTEGER) AS "rank"
             |  FROM scored)
             |SELECT query_id, vec_id, cosine, "rank" FROM ranked
             |WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin)),

QueryDef("s3_ivf_topk",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val centroids = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid_vec"))
        val q = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        S.ivfTopK(emb, q, centroids, k = 5, nProbe = 2).orderBy("query_id", "rank")
      },
      Some("""WITH c AS (
             |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
             |  FROM embeddings WHERE vec_id < 4),
             |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |assign AS (
             |  SELECT vec_id, v, cid FROM (
             |    SELECT e.vec_id, e.v, c.cid,
             |           row_number() OVER (PARTITION BY e.vec_id
             |             ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
             |    FROM e, c) WHERE rn = 1),
             |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
             |probes AS (
             |  SELECT query_id, qv, cid FROM (
             |    SELECT q.query_id, q.qv, c.cid,
             |           row_number() OVER (PARTITION BY q.query_id
             |             ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.cid) AS rn
             |    FROM q, c) WHERE rn <= 2),
             |scored AS (
             |  SELECT p.query_id, a.vec_id,
             |         round(list_cosine_similarity(a.v, p.qv), 6) AS cosine
             |  FROM assign a JOIN probes p ON a.cid = p.cid
             |  WHERE a.vec_id <> p.query_id),
             |ranked AS (
             |  SELECT query_id, vec_id, cosine,
             |         CAST(row_number() OVER (PARTITION BY query_id
             |           ORDER BY cosine DESC, vec_id) AS INTEGER) AS "rank"
             |  FROM scored)
             |SELECT query_id, vec_id, cosine, "rank" FROM ranked
             |WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin)),

QueryDef("s3b_ivf_trained",
      // the IVF path you'd actually run at 10^5 centroids: k-means-TRAINED
      // centroids (distributed Lloyd, only the k centers reach the driver)
      // searched through the two-level coarse quantizer, so assignment
      // costs O(wProbe*k/coarseCells) cosines per row instead of O(k).
      // Training uses [[graft.functions.SimilarityFunctions
      // .trainCentroidsReplayable]] — pinned iterations, lowest-id init,
      // exact-decimal mean updates rounded 6dp — so the FULL pipeline
      // (train → coarse build → assignment → probe → top-k) replays in
      // the generated oracle below (MLlib's k-means|| init was the one
      // black box; the r11 verdict's item 7). QueriesSpec additionally
      // bounds mean recall@5 against the exact s1 results. The synthetic
      // embeddings are near-uniform directions (max pairwise cosine <
      // 0.7, no cluster structure), so the probe budget here is wide —
      // nProbe 12/16 — to make the recall bound meaningful; real corpora
      // cluster, and proportionally smaller budgets hold the same recall.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val centroids = S.trainCentroidsReplayable(emb, k = 16, iters = 3)
        val q = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        S.ivfTopKHierarchical(emb, q, centroids, k = 5, nProbe = 12,
          coarseCells = 4, wProbe = 3).orderBy("query_id", "rank")
      },
      Some(s3bOracle(k = 16, dim = 64, trainIters = 3, coarseCells = 4,
        coarseIters = 10, wProbe = 3, nProbe = 12, topK = 5))),

QueryDef("s6_lsh_incremental",
      // INCREMENTAL embedding near-dup: the perturbed copies (ids
      // +100000) play the "new batch" probing the original corpus —
      // cross-side banded join only, no existing x existing self-join.
      // Shares s2's generated-plane CTEs; the candidate filter swaps
      // the ordering predicate for the side split.
      (s, dir) => {
        val all = plantedEmbeddings(s, dir)
        S.lshNeighborPairsAgainst(
            all.filter(col("id") < 100000L), all.filter(col("id") >= 100000L),
            dim = 64, nBits = 16, bands = 4, minCosine = 0.8,
            idCol = "id", vecCol = "v")
          .orderBy("id_a", "id_b")
      },
      Some {
        // the oracle is s2's with only the candidate predicate swapped —
        // a reworded s2 must fail HERE, not silently no-op the replace
        // and degrade s6's oracle to self-join semantics
        require(s2OracleCtes.contains("WHERE x.id < y.id"),
          "s6's oracle rewrites s2's candidate predicate; update both together")
        s2OracleCtes.replace("WHERE x.id < y.id",
          "WHERE x.id < 100000 AND y.id >= 100000") +
          "\nSELECT id_a, id_b, cosine FROM verified\nORDER BY id_a, id_b"
      }),

QueryDef("s7_ann_recall",
      // Recall@5 of the IVF index against the exact brute-force scan,
      // per query — the evaluation harness every ANN deployment ships
      // beside the index itself (an approximate index without a
      // measured recall is a guess). Reuses s1's and s3's operators
      // UNCHANGED and joins the two top-k sets on (query_id, vec_id);
      // both sides are k·|queries| rows — broadcast-sized by
      // construction at any corpus scale, so the recall overlay adds
      // no data-sized shuffle beyond what the two searches already do.
      // n_hits is an exact count; recall one exact IEEE division.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        val centroids = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid_vec"))
        val exact = S.bruteForceTopK(emb, q, 5).select("query_id", "vec_id")
        val approx = S.ivfTopK(emb, q, centroids, k = 5, nProbe = 2)
          .select("query_id", "vec_id")
        val hits = exact.join(approx, Seq("query_id", "vec_id"))
          .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
        q.select("query_id").join(hits, Seq("query_id"), "left")
          .select(col("query_id"),
            coalesce(col("n_hits"), lit(0L)).as("n_hits"))
          .withColumn("recall", col("n_hits").cast("double") / 5.0)
          .orderBy("query_id")
      },
      Some("""WITH bq AS (
             |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
             |  FROM embeddings WHERE vec_id < 8),
             |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |bscored AS (
             |  SELECT bq.query_id, e.vec_id,
             |         round(list_cosine_similarity(e.v, bq.qv), 6) AS cosine
             |  FROM e, bq WHERE e.vec_id <> bq.query_id),
             |bf AS (
             |  SELECT query_id, vec_id FROM (
             |    SELECT query_id, vec_id,
             |           row_number() OVER (PARTITION BY query_id
             |             ORDER BY cosine DESC, vec_id) AS rn
             |    FROM bscored) WHERE rn <= 5),
             |c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
             |      FROM embeddings WHERE vec_id < 4),
             |assign AS (
             |  SELECT vec_id, v, cid FROM (
             |    SELECT e.vec_id, e.v, c.cid,
             |           row_number() OVER (PARTITION BY e.vec_id
             |             ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
             |    FROM e, c) WHERE rn = 1),
             |probes AS (
             |  SELECT query_id, qv, cid FROM (
             |    SELECT bq.query_id, bq.qv, c.cid,
             |           row_number() OVER (PARTITION BY bq.query_id
             |             ORDER BY list_cosine_similarity(bq.qv, c.cv) DESC, c.cid) AS rn
             |    FROM bq, c) WHERE rn <= 2),
             |ascored AS (
             |  SELECT p.query_id, a.vec_id,
             |         round(list_cosine_similarity(a.v, p.qv), 6) AS cosine
             |  FROM assign a JOIN probes p ON a.cid = p.cid
             |  WHERE a.vec_id <> p.query_id),
             |af AS (
             |  SELECT query_id, vec_id FROM (
             |    SELECT query_id, vec_id,
             |           row_number() OVER (PARTITION BY query_id
             |             ORDER BY cosine DESC, vec_id) AS rn
             |    FROM ascored) WHERE rn <= 5),
             |hits AS (
             |  SELECT bf.query_id, count(*) AS n
             |  FROM bf JOIN af ON bf.query_id = af.query_id AND bf.vec_id = af.vec_id
             |  GROUP BY 1)
             |SELECT bq.query_id,
             |  CAST(COALESCE(h.n, 0) AS BIGINT) AS n_hits,
             |  CAST(COALESCE(h.n, 0) AS DOUBLE) / 5.0 AS recall
             |FROM bq LEFT JOIN hits h ON bq.query_id = h.query_id
             |ORDER BY bq.query_id""".stripMargin)),

QueryDef("s8_pq_adc_topk",
      // Product-quantized ANN (Jégou TPAMI 2011): the 64-dim corpus
      // compresses to 8 subspace codes per vector ([[SimilarityFunctions
      // .pqEncode]]) and queries scan the CODES, never the raw vectors,
      // via per-query ADC lookup tables ([[pqTopK]]) — the memory shape
      // that lets a 100 TB corpus's vectors serve ANN from executor RAM.
      // Codebooks here are data-derived, not trained (code c of subspace
      // s = dims [8s,8s+8) of embedding c, c < 4 — the same fixed-
      // centroid convention s3/s7 use), so DuckDB replays the ENTIRE
      // pipeline exactly: slice → argmin-L2 encode → reconstruct →
      // cosine → top-k. Recall vs the exact scan is pinned by the
      // trained-codebook spec; THIS query pins bit-level semantics.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val cb = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").cast("int").as("code"),
            col("embedding").cast("array<double>").as("v"))
          .select(explode(sequence(lit(0), lit(7))).as("subspace"),
            col("code"), col("v"))
          .select(col("subspace"), col("code"),
            slice(col("v"), col("subspace") * 8 + 1, lit(8)).as("centroid_vec"))
        val enc = S.pqEncode(emb, cb, dim = 64, m = 8, codes = 4)
        val q = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        S.pqTopK(enc, q, cb, dim = 64, m = 8, codes = 4, k = 5)
          .orderBy("query_id", "rank")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |cb AS (
             |  SELECT s.subspace, CAST(c.vec_id AS INTEGER) AS code,
             |         list_slice(c.v, s.subspace * 8 + 1, s.subspace * 8 + 8) AS centroid_vec
             |  FROM e c, generate_series(0, 7) AS s(subspace)
             |  WHERE c.vec_id < 4),
             |enc AS (
             |  SELECT vec_id, subspace, centroid_vec FROM (
             |    SELECT e.vec_id, cb.subspace, cb.centroid_vec,
             |           row_number() OVER (PARTITION BY e.vec_id, cb.subspace
             |             ORDER BY list_distance(
             |               list_slice(e.v, cb.subspace * 8 + 1, cb.subspace * 8 + 8),
             |               cb.centroid_vec), cb.code) AS rn
             |    FROM e, cb) WHERE rn = 1),
             |recon AS (
             |  SELECT vec_id, flatten(list(centroid_vec ORDER BY subspace)) AS rv
             |  FROM enc GROUP BY vec_id),
             |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
             |scored AS (
             |  SELECT q.query_id, r.vec_id,
             |         round(list_cosine_similarity(r.rv, q.qv), 6) AS cosine
             |  FROM recon r, q WHERE r.vec_id <> q.query_id),
             |ranked AS (
             |  SELECT query_id, vec_id, cosine,
             |         CAST(row_number() OVER (PARTITION BY query_id
             |           ORDER BY cosine DESC, vec_id) AS INTEGER) AS "rank"
             |  FROM scored)
             |SELECT query_id, vec_id, cosine, "rank" FROM ranked
             |WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin)),

QueryDef("s9_pq_rerank",
      // ADC candidates → exact re-rank ([[SimilarityFunctions
      // .pqTopKRerank]]): the compressed-code scan nominates each
      // query's 15 best approximate matches, ONLY those rows read their
      // raw vectors for an exact cosine, and the final top-5 ranks the
      // exact scores — the production ANN serving shape (compressed
      // index in RAM, exact precision on the head of the list). Same
      // fixed data-derived codebooks as s8, so DuckDB replays candidate
      // generation bit-for-bit and then the exact rescore join.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val cb = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").cast("int").as("code"),
            col("embedding").cast("array<double>").as("v"))
          .select(explode(sequence(lit(0), lit(7))).as("subspace"),
            col("code"), col("v"))
          .select(col("subspace"), col("code"),
            slice(col("v"), col("subspace") * 8 + 1, lit(8)).as("centroid_vec"))
        val enc = S.pqEncode(emb, cb, dim = 64, m = 8, codes = 4)
        val q = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        S.pqTopKRerank(enc, emb, q, cb, dim = 64, m = 8, codes = 4,
            k = 5, rerank = 15)
          .orderBy("query_id", "rank")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |cb AS (
             |  SELECT s.subspace, CAST(c.vec_id AS INTEGER) AS code,
             |         list_slice(c.v, s.subspace * 8 + 1, s.subspace * 8 + 8) AS centroid_vec
             |  FROM e c, generate_series(0, 7) AS s(subspace)
             |  WHERE c.vec_id < 4),
             |enc AS (
             |  SELECT vec_id, subspace, centroid_vec FROM (
             |    SELECT e.vec_id, cb.subspace, cb.centroid_vec,
             |           row_number() OVER (PARTITION BY e.vec_id, cb.subspace
             |             ORDER BY list_distance(
             |               list_slice(e.v, cb.subspace * 8 + 1, cb.subspace * 8 + 8),
             |               cb.centroid_vec), cb.code) AS rn
             |    FROM e, cb) WHERE rn = 1),
             |recon AS (
             |  SELECT vec_id, flatten(list(centroid_vec ORDER BY subspace)) AS rv
             |  FROM enc GROUP BY vec_id),
             |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
             |adc AS (
             |  SELECT q.query_id, r.vec_id,
             |         round(list_cosine_similarity(r.rv, q.qv), 6) AS acos
             |  FROM recon r, q WHERE r.vec_id <> q.query_id),
             |cand AS (
             |  SELECT query_id, vec_id FROM (
             |    SELECT query_id, vec_id,
             |           row_number() OVER (PARTITION BY query_id
             |             ORDER BY acos DESC, vec_id) AS rn
             |    FROM adc) WHERE rn <= 15),
             |rescored AS (
             |  SELECT c.query_id, c.vec_id,
             |         round(list_cosine_similarity(e.v, q.qv), 6) AS cosine
             |  FROM cand c
             |  JOIN e ON e.vec_id = c.vec_id
             |  JOIN q ON q.query_id = c.query_id),
             |ranked AS (
             |  SELECT query_id, vec_id, cosine,
             |         CAST(row_number() OVER (PARTITION BY query_id
             |           ORDER BY cosine DESC, vec_id) AS INTEGER) AS "rank"
             |  FROM rescored)
             |SELECT query_id, vec_id, cosine, "rank" FROM ranked
             |WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin)),

QueryDef("s10_knn_label_vote",
      // KNN majority-vote auto-labeling ([[SimilarityFunctions
      // .knnLabelVote]]) over the labeled embeddings: each of the first
      // 20 vectors takes the label held by most of its 10 exact-cosine
      // nearest neighbors (self excluded, vote ties to the lower label)
      // — leave-one-out label propagation, the bootstrap for
      // classifying an unlabeled corpus from a seed set. The synthetic
      // labels are nearly geometry-free (within-label cosine ≈ 0.01 vs
      // ≈ 0 across), so this pins the vote SEMANTICS bit-for-bit, not
      // accuracy — the clustered-data behavior is spec-pinned with
      // controlled vectors. Full DuckDB replay: scan → top-k → label
      // join → argmax.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 20)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        S.knnLabelVote(emb, q, emb.select(col("vec_id"), col("label")), k = 10)
          .orderBy("query_id")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
             |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 20),
             |scored AS (
             |  SELECT q.query_id, e.vec_id,
             |         round(list_cosine_similarity(e.v, q.qv), 6) AS cos
             |  FROM e, q WHERE e.vec_id <> q.query_id),
             |nn AS (
             |  SELECT query_id, vec_id FROM (
             |    SELECT query_id, vec_id,
             |           row_number() OVER (PARTITION BY query_id
             |             ORDER BY cos DESC, vec_id) AS rn
             |    FROM scored) WHERE rn <= 10),
             |v AS (
             |  SELECT nn.query_id, e.label, count(*) AS votes
             |  FROM nn JOIN e ON e.vec_id = nn.vec_id
             |  WHERE e.label IS NOT NULL GROUP BY 1, 2),
             |w AS (
             |  SELECT query_id, label, votes,
             |         row_number() OVER (PARTITION BY query_id
             |           ORDER BY votes DESC, label) AS rn
             |  FROM v)
             |SELECT query_id, label, votes FROM w WHERE rn = 1
             |ORDER BY query_id""".stripMargin)),

QueryDef("s11_ivfpq_topk",
      // IVF-PQ, the composition that serves ANN at 100 TB
      // ([[SimilarityFunctions.ivfPqIndex]]/[[ivfPqTopK]]): the stored
      // index is (cell, 8 codes) per vector — raw vectors never resident
      // at serve time — and each query ADC-scans ONLY its 2 nearest of 4
      // coarse cells. Fixed data-derived centroids (vec_id < 4, the
      // s3/s7 convention) and codebooks (s8's), so DuckDB replays
      // assignment, probing, encoding, reconstruction, and scoring
      // bit-for-bit.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val cb = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").cast("int").as("code"),
            col("embedding").cast("array<double>").as("v"))
          .select(explode(sequence(lit(0), lit(7))).as("subspace"),
            col("code"), col("v"))
          .select(col("subspace"), col("code"),
            slice(col("v"), col("subspace") * 8 + 1, lit(8)).as("centroid_vec"))
        val cents = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").as("centroid_id"),
            col("embedding").cast("array<double>").as("centroid_vec"))
        val idx = S.ivfPqIndex(emb, cents, cb, dim = 64, m = 8, codes = 4)
        val q = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        S.ivfPqTopK(idx, q, cents, cb, dim = 64, m = 8, codes = 4,
            k = 5, nProbe = 2)
          .orderBy("query_id", "rank")
      },
      Some(s11OracleSql)),

QueryDef("s11b_ivfpq_stored",
      // s11's IVF-PQ serving from the STORED, cell-partitioned index
      // ([[graft.functions.SimilarityFunctions
      // .writeIvfPqIndexPartitioned]] → [[SimilarityFunctions
      // .ivfPqTopKStored]]): the (cell, codes) table persists as hive
      // `cell=` directories — the nightly-refresh serving layout —
      // probe assignment runs BEFORE the plan compiles
      // ([[SimilarityFunctions.probedCells]]), and the probed cell
      // ids become an `isin` on the partition column, so the serving
      // scan carries a PartitionFilters entry and reads nProbe
      // DIRECTORIES, not the index (StoredAnnIndexSpec pins the
      // pruning with an unpartitioned positive control). Same fixed
      // centroids/codebooks as s11, so the s11 oracle applies
      // UNCHANGED — the hash-match proves the stored/pruned layout
      // is result-transparent.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val cb = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").cast("int").as("code"),
            col("embedding").cast("array<double>").as("v"))
          .select(explode(sequence(lit(0), lit(7))).as("subspace"),
            col("code"), col("v"))
          .select(col("subspace"), col("code"),
            slice(col("v"), col("subspace") * 8 + 1, lit(8)).as("centroid_vec"))
        val cents = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").as("centroid_id"),
            col("embedding").cast("array<double>").as("centroid_vec"))
        val idx = S.ivfPqIndex(emb, cents, cb, dim = 64, m = 8, codes = 4)
        val path = new java.io.File(
          sys.props("java.io.tmpdir"), "graft_s11b_ivfpq_index").getAbsolutePath
        S.writeIvfPqIndexPartitioned(idx, path)
        val q = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        S.ivfPqTopKStored(s, path, q, cents, cb, dim = 64, m = 8,
            codes = 4, k = 5, nProbe = 2)
          .orderBy("query_id", "rank")
      },
      Some(s11OracleSql)),

QueryDef("s11c_ivfpq_append",
      // the INCREMENTAL refresh of s11b's stored index
      // ([[SimilarityFunctions.appendIvfPqIndexPartitioned]]): night 0
      // builds the index from the even-id half, night 1 encodes ONLY
      // the odd-id batch and appends into the existing `cell=`
      // directories — the corpus-sized index is never read or
      // rewritten (encoding is per-vector independent under fixed
      // centroids/codebooks). Serving the appended index must equal
      // serving a full rebuild, so the s11 oracle applies UNCHANGED —
      // the hash-match is the proof the incremental path drops or
      // duplicates nothing.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val cb = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").cast("int").as("code"),
            col("embedding").cast("array<double>").as("v"))
          .select(explode(sequence(lit(0), lit(7))).as("subspace"),
            col("code"), col("v"))
          .select(col("subspace"), col("code"),
            slice(col("v"), col("subspace") * 8 + 1, lit(8)).as("centroid_vec"))
        val cents = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").as("centroid_id"),
            col("embedding").cast("array<double>").as("centroid_vec"))
        val path = new java.io.File(
          sys.props("java.io.tmpdir"), "graft_s11c_ivfpq_index").getAbsolutePath
        val night0 = S.ivfPqIndex(emb.filter(col("vec_id") % 2 === 0),
          cents, cb, dim = 64, m = 8, codes = 4)
        S.writeIvfPqIndexPartitioned(night0, path)
        S.appendIvfPqIndexPartitioned(emb.filter(col("vec_id") % 2 === 1),
          path, cents, cb, dim = 64, m = 8, codes = 4)
        val q = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        S.ivfPqTopKStored(s, path, q, cents, cb, dim = 64, m = 8,
            codes = 4, k = 5, nProbe = 2)
          .orderBy("query_id", "rank")
      },
      Some(s11OracleSql)),

QueryDef("s11d_ivfpq_compact",
      // MAINTENANCE of s11c's append-forever index ([[graft.functions
      // .SimilarityFunctions.compactIvfPqIndexPartitioned]]): three
      // "nights" of appends fragment every `cell=` directory into
      // per-night file sets; compaction rewrites only cells past the
      // file bound — per-cell staged tmp→swap renames, crash-recovered
      // on entry — into one id-sorted file each, then serves from the
      // compacted layout. Rows never change, only file layout, so the
      // s11 oracle applies UNCHANGED: the hash-match is the proof that
      // compaction drops or duplicates nothing, and
      // StoredAnnIndexSpec pins the file-count drop + pruning.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val cb = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").cast("int").as("code"),
            col("embedding").cast("array<double>").as("v"))
          .select(explode(sequence(lit(0), lit(7))).as("subspace"),
            col("code"), col("v"))
          .select(col("subspace"), col("code"),
            slice(col("v"), col("subspace") * 8 + 1, lit(8)).as("centroid_vec"))
        val cents = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").as("centroid_id"),
            col("embedding").cast("array<double>").as("centroid_vec"))
        val path = new java.io.File(
          sys.props("java.io.tmpdir"), "graft_s11d_ivfpq_index").getAbsolutePath
        val night0 = S.ivfPqIndex(emb.filter(col("vec_id") % 3 === 0),
          cents, cb, dim = 64, m = 8, codes = 4)
        S.writeIvfPqIndexPartitioned(night0, path)
        S.appendIvfPqIndexPartitioned(emb.filter(col("vec_id") % 3 === 1),
          path, cents, cb, dim = 64, m = 8, codes = 4)
        S.appendIvfPqIndexPartitioned(emb.filter(col("vec_id") % 3 === 2),
          path, cents, cb, dim = 64, m = 8, codes = 4)
        S.compactIvfPqIndexPartitioned(s, path, maxFilesPerCell = 1)
        val q = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        S.ivfPqTopKStored(s, path, q, cents, cb, dim = 64, m = 8,
            codes = 4, k = 5, nProbe = 2)
          .orderBy("query_id", "rank")
      },
      Some(s11OracleSql)),

QueryDef("s12_ivfpq_rerank",
      // the FULL serving composition ([[SimilarityFunctions
      // .ivfPqTopKRerank]], Jégou et al. TPAMI 2011 §V): probe 2 of 4
      // cells, ADC-score their index rows, widen to 10 candidates,
      // re-score the head EXACTLY from raw vectors, keep the true
      // top 5. Only candidate rows ever read a raw vector. Oracle =
      // s11's CTEs with the rank-10 cut plus the exact-cosine tail.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val cb = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").cast("int").as("code"),
            col("embedding").cast("array<double>").as("v"))
          .select(explode(sequence(lit(0), lit(7))).as("subspace"),
            col("code"), col("v"))
          .select(col("subspace"), col("code"),
            slice(col("v"), col("subspace") * 8 + 1, lit(8)).as("centroid_vec"))
        val cents = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").as("centroid_id"),
            col("embedding").cast("array<double>").as("centroid_vec"))
        val idx = S.ivfPqIndex(emb, cents, cb, dim = 64, m = 8, codes = 4)
        val q = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        S.ivfPqTopKRerank(idx, emb, q, cents, cb, dim = 64, m = 8,
            codes = 4, k = 5, rerank = 10, nProbe = 2)
          .orderBy("query_id", "rank")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |cb AS (
             |  SELECT s.subspace, CAST(c.vec_id AS INTEGER) AS code,
             |         list_slice(c.v, s.subspace * 8 + 1, s.subspace * 8 + 8) AS centroid_vec
             |  FROM e c, generate_series(0, 7) AS s(subspace)
             |  WHERE c.vec_id < 4),
             |enc AS (
             |  SELECT vec_id, subspace, centroid_vec FROM (
             |    SELECT e.vec_id, cb.subspace, cb.centroid_vec,
             |           row_number() OVER (PARTITION BY e.vec_id, cb.subspace
             |             ORDER BY list_distance(
             |               list_slice(e.v, cb.subspace * 8 + 1, cb.subspace * 8 + 8),
             |               cb.centroid_vec), cb.code) AS rn
             |    FROM e, cb) WHERE rn = 1),
             |recon AS (
             |  SELECT vec_id, flatten(list(centroid_vec ORDER BY subspace)) AS rv
             |  FROM enc GROUP BY vec_id),
             |cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 4),
             |cell AS (
             |  SELECT vec_id, cid FROM (
             |    SELECT e.vec_id, c.cid,
             |           row_number() OVER (PARTITION BY e.vec_id
             |             ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
             |    FROM e, cents c) WHERE rn = 1),
             |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
             |probe AS (
             |  SELECT query_id, cid FROM (
             |    SELECT q.query_id, c.cid,
             |           row_number() OVER (PARTITION BY q.query_id
             |             ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.cid) AS rn
             |    FROM q, cents c) WHERE rn <= 2),
             |scored AS (
             |  SELECT q.query_id, r.vec_id,
             |         round(list_cosine_similarity(r.rv, q.qv), 6) AS cosine
             |  FROM recon r
             |  JOIN cell ON cell.vec_id = r.vec_id
             |  JOIN probe p ON p.cid = cell.cid
             |  JOIN q ON q.query_id = p.query_id
             |  WHERE r.vec_id <> q.query_id),
             |cand AS (
             |  SELECT query_id, vec_id FROM (
             |    SELECT query_id, vec_id,
             |           row_number() OVER (PARTITION BY query_id
             |             ORDER BY cosine DESC, vec_id) AS rn
             |    FROM scored) WHERE rn <= 10),
             |ex AS (
             |  SELECT c.query_id, c.vec_id,
             |         round(list_cosine_similarity(ev.v, q.qv), 6) AS cosine
             |  FROM cand c
             |  JOIN e ev ON ev.vec_id = c.vec_id
             |  JOIN q ON q.query_id = c.query_id
             |  WHERE round(list_cosine_similarity(ev.v, q.qv), 6) IS NOT NULL),
             |rr AS (
             |  SELECT query_id, vec_id, cosine,
             |         CAST(row_number() OVER (PARTITION BY query_id
             |           ORDER BY cosine DESC, vec_id) AS INTEGER) AS "rank"
             |  FROM ex)
             |SELECT query_id, vec_id, cosine, "rank" FROM rr
             |WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin)),

QueryDef("s2_lsh_pairs",
      // the embeddings table has NO true near-duplicates (max pairwise
      // cosine < 0.7), so the query plants them: union the corpus with a
      // deterministically perturbed copy (v + 0.05 elementwise → planted
      // cosine ≈ 0.92–0.95). Banded hyperplane LSH (4 bands × 4 bits)
      // must then recover the planted pairs — recall ≈ 0.97 at these
      // cosines, vs ≈ 0 for full-signature equality. Fully oracle-checked:
      // the hyperplane coefficients are a pure function of the seed
      // ([[SimilarityFunctions.hyperplanes]]), so [[s2OracleSql]] embeds
      // the IDENTICAL plane doubles as SQL literals and DuckDB replays
      // signature → banding → candidates → cosine verify end-to-end.
      (s, dir) => S.lshNeighborPairs(plantedEmbeddings(s, dir), dim = 64,
          nBits = 16, bands = 4, minCosine = 0.8, idCol = "id", vecCol = "v")
        .orderBy("id_a", "id_b"),
      Some(s2OracleSql)),

QueryDef("eval2_auc",
      // threshold-free classifier evaluation: ROC-AUC of the cls1 NB
      // scores against the gold is-English labels, via the rank
      // statistic AUC = (Σ ranks⁺ − P(P+1)/2) / (P·N) with AVERAGE
      // ranks on ties (the Mann-Whitney U normalization — exact, not
      // trapezoid-approximated). Ranks derive from the per-score-LEVEL
      // histogram: the average tie rank of a level with m rows and B
      // rows below it is B + (m+1)/2 exactly (what avg(row_number)
      // over the tie partition computes, tie-order invariant), so the
      // rank sum collapses to pos·(B+(m+1)/2) per level — every term
      // an exact multiple of 0.5 below 2^53, order-independent in
      // double. The only window left is over distinct 6dp score
      // levels (≤ 10⁶+1 regardless of corpus size — bounded; the r11
      // verdict's eval2 scale-tier item). AUC is a rational with
      // denominator 2PN ≪ 2·10⁶ — the 6dp round is boundary-free.
      (s, dir) => {
        val d = docs(s, dir)
        val labeled = d.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("text"), (col("lang") === "en").as("label"))
        val (w, bias) = Cls.naiveBayesWeights(labeled, "text", "label",
          buckets = 1 << 16, hash = D.md5Hash60)
        val scored = Cls.scoreLinear(d, "doc_id", "text", w, bias,
          buckets = 1 << 16, hash = D.md5Hash60)
        val lab = d.select(col("doc_id"), (col("lang") === "en").cast("long").as("_y"))
        val lv = scored.join(lab, "doc_id")
          .groupBy("score")
          .agg(count(lit(1)).as("_lm"), sum(col("_y")).as("_pos"))
        val wL = Window.orderBy("score")
          .rowsBetween(Window.unboundedPreceding, 0)
        lv.withColumn("_cum", sum(col("_lm")).over(wL))
          .select(col("_lm"), col("_pos"),
            ((col("_cum") - col("_lm")).cast("double") +
              (col("_lm") + 1).cast("double") / 2.0).as("_r"))
          .agg(sum(col("_pos")).as("_p"),
            sum(col("_lm") - col("_pos")).as("_n"),
            sum(col("_pos").cast("double") * col("_r")).as("_s"))
          .select(col("_p").as("n_pos"), col("_n").as("n_neg"),
            round((col("_s") - (col("_p") * (col("_p") + 1)).cast("double") / 2.0) /
              (col("_p") * col("_n")).cast("double"), 6).as("auc"))
      },
      Some("WITH " + nbScoreCtes +
        """,
          |scored AS (
          |  SELECT d.doc_id,
          |    round(1.0 / (1.0 + exp(-(coalesce(sc.m, 0.0) + pr.bias))), 6) AS score,
          |    (d.lang = 'en') AS y
          |  FROM documents d CROSS JOIN pr LEFT JOIN sc USING (doc_id)),
          |rk AS (
          |  SELECT score, y, row_number() OVER (ORDER BY score) AS rn
          |  FROM scored),
          |ar AS (SELECT y, avg(rn) OVER (PARTITION BY score) AS r FROM rk),
          |agg AS (
          |  SELECT sum(CASE WHEN y THEN 1 ELSE 0 END) AS p,
          |         sum(CASE WHEN y THEN 0 ELSE 1 END) AS n,
          |         sum(CASE WHEN y THEN r END) AS s
          |  FROM ar)
          |SELECT CAST(p AS BIGINT) AS n_pos, CAST(n AS BIGINT) AS n_neg,
          |  round((s - CAST(p * (p + 1) AS DOUBLE) / 2.0)
          |        / CAST(p * n AS DOUBLE), 6) AS auc
          |FROM agg""".stripMargin)),

QueryDef("eval3_calibration",
      // reliability diagram: cls1's scores bucketed into score deciles,
      // each reporting n, mean predicted probability, and observed
      // positive rate — "when the model says 0.8, is it right 80% of
      // the time?" (the eval the threshold-free AUC can't answer). One
      // hash agg on 10 buckets; frac_pos is a small-denominator
      // rational (boundary-free round), mean_score's float-sum ulps
      // sit far under 6dp (the a4 convention).
      (s, dir) => {
        val d = docs(s, dir)
        val labeled = d.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("text"), (col("lang") === "en").as("label"))
        val (w, bias) = Cls.naiveBayesWeights(labeled, "text", "label",
          buckets = 1 << 16, hash = D.md5Hash60)
        val scored = Cls.scoreLinear(d, "doc_id", "text", w, bias,
          buckets = 1 << 16, hash = D.md5Hash60)
        val lab = d.select(col("doc_id"), (col("lang") === "en").cast("long").as("_y"))
        scored.join(lab, "doc_id")
          .groupBy(least(floor(col("score") * 10), lit(9)).cast("int").as("bucket"))
          .agg(count(lit(1)).as("n"),
            round(avg(col("score")), 6).as("mean_score"),
            round(sum(col("_y")).cast("double") / count(lit(1)), 6).as("frac_pos"))
          .orderBy("bucket")
      },
      Some("WITH " + nbScoreCtes +
        """,
          |scored AS (
          |  SELECT d.doc_id,
          |    round(1.0 / (1.0 + exp(-(coalesce(sc.m, 0.0) + pr.bias))), 6) AS score,
          |    CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
          |  FROM documents d CROSS JOIN pr LEFT JOIN sc USING (doc_id))
          |SELECT CAST(least(floor(score * 10), 9) AS INTEGER) AS bucket,
          |  count(*) AS n,
          |  round(avg(score), 6) AS mean_score,
          |  round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS frac_pos
          |FROM scored GROUP BY 1 ORDER BY 1""".stripMargin)),

QueryDef("eval1_langid_confusion",
      // classifier evaluation as a first-class op: the n-gram langid
      // heuristic scored against the gold labels — full confusion
      // matrix with per-gold recall. The matrix is langs²-sized and
      // pinned; per-gold totals derive from the matrix itself (no
      // second corpus pass) and broadcast into the recall join.
      (s, dir) => {
        val cells = graft.Caches.trackedPersist(
          docs(s, dir)
            .select(col("lang").as("gold"),
              T.languageId(col("text")).as("pred"))
            .groupBy("gold", "pred").agg(count(lit(1)).as("n")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val totals = cells.groupBy("gold").agg(sum("n").as("tot"))
        cells.join(broadcast(totals), "gold")
          .select(col("gold"), col("pred"), col("n"),
            round(col("n").cast("double") / col("tot"), 6).as("recall"))
          .orderBy("gold", "pred")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM documents),
             |h AS (SELECT doc_id,
             |  len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','ein','mit','auf','zu'], x))) AS h_de,
             |  len(list_filter(toks, x -> list_contains(['the','and','of','to','is','in','that','it','was','for'], x))) AS h_en,
             |  len(list_filter(toks, x -> list_contains(['el','la','los','las','es','una','por','para','que','con'], x))) AS h_es,
             |  len(list_filter(toks, x -> list_contains(['le','la','les','et','est','une','pour','dans','que','des'], x))) AS h_fr
             |FROM t),
             |p AS (SELECT doc_id,
             |  CASE WHEN greatest(h_de, h_en, h_es, h_fr) <= 0 THEN 'und'
             |       WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
             |       WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
             |       WHEN h_es >= h_fr THEN 'es'
             |       ELSE 'fr' END AS pred
             |FROM h),
             |c AS (SELECT d.lang AS gold, p.pred, count(*) AS n
             |      FROM p JOIN documents d USING (doc_id) GROUP BY 1, 2),
             |tt AS (SELECT gold, CAST(sum(n) AS BIGINT) AS tot
             |       FROM c GROUP BY 1)
             |SELECT c.gold, c.pred, c.n,
             |       round(CAST(c.n AS DOUBLE) / tt.tot, 6) AS recall
             |FROM c JOIN tt USING (gold) ORDER BY gold, pred""".stripMargin)),

QueryDef("r2_unigram_lm",
      // CCNet-style LM quality filter, honest sandbox version: mean
      // ln P(token) under the corpus's own unigram model. Vocabulary
      // aggregates once and broadcasts; the per-doc mean is the only
      // data-sized shuffle.
      (s, dir) => R.unigramLogProb(docs(s, dir), "doc_id", "text")
        .select(col("doc_id"), round(col("log_prob"), 6).as("log_prob"))
        .orderBy("doc_id"),
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |         unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
             |  FROM documents),
             |tt AS (SELECT doc_id, tok FROM toks WHERE length(tok) > 0),
             |vocab AS (SELECT tok, count(*) AS n FROM tt GROUP BY 1),
             |tot AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM vocab),
             |sc AS (
             |  SELECT tt.doc_id,
             |         avg(ln(CAST(n AS DOUBLE) / total)) AS lp
             |  FROM tt JOIN vocab USING (tok), tot GROUP BY 1)
             |SELECT d.doc_id, round(coalesce(sc.lp, -20.0), 6) AS log_prob
             |FROM documents d LEFT JOIN sc USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

QueryDef("r3_bigram_lm",
      // one order up from r2: mean ln P(w2|w1) under the corpus's own
      // bigram model — scrambled-word gibberish that fools a unigram
      // model collapses here. Prefix counts make P sum to 1 per prefix.
      (s, dir) => R.bigramLogProb(docs(s, dir), "doc_id", "text")
        .select(col("doc_id"), round(col("log_prob"), 6).as("log_prob"))
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
             |  GROUP BY 1)
             |SELECT d.doc_id, round(coalesce(sc.lp, -20.0), 6) AS log_prob
             |FROM documents d LEFT JOIN sc USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

QueryDef("r1_bm25",
      // BM25 keyword relevance over the corpus: stats (N, Σdl, per-term
      // df) aggregate to ONE row and broadcast back, so scoring is a
      // shuffle-free projection. Score = fixed-order sum of per-term IEEE
      // chains, rounded to 6dp — cross-engine reproducible.
      (s, dir) => R.bm25(docs(s, dir), "doc_id", "text",
        Seq("filter", "stream", "customer")).orderBy("doc_id"),
      Some("""WITH d AS (
             |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w,
             |         CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS dl
             |  FROM documents),
             |st AS (
             |  SELECT CAST(count(*) AS DOUBLE) AS n, CAST(sum(dl) AS DOUBLE) AS sumdl,
             |    CAST(sum(CASE WHEN list_contains(w, 'filter') THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
             |    CAST(sum(CASE WHEN list_contains(w, 'stream') THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
             |    CAST(sum(CASE WHEN list_contains(w, 'customer') THEN 1 ELSE 0 END) AS DOUBLE) AS df2
             |  FROM d),
             |sc AS (
             |  SELECT doc_id,
             |    CAST(len(list_filter(w, x -> x = 'filter')) AS DOUBLE) AS tf0,
             |    CAST(len(list_filter(w, x -> x = 'stream')) AS DOUBLE) AS tf1,
             |    CAST(len(list_filter(w, x -> x = 'customer')) AS DOUBLE) AS tf2,
             |    CAST(dl AS DOUBLE) AS dl, n, sumdl, df0, df1, df2
             |  FROM d, st)
             |SELECT doc_id, round(
             |    ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0)
             |      * (tf0 * (1.2 + 1.0)) / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sumdl / n)))
             |  + ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0)
             |      * (tf1 * (1.2 + 1.0)) / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sumdl / n)))
             |  + ln((n - df2 + 0.5) / (df2 + 0.5) + 1.0)
             |      * (tf2 * (1.2 + 1.0)) / (tf2 + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sumdl / n))),
             |  6) AS bm25
             |FROM sc ORDER BY doc_id""".stripMargin)),

QueryDef("r5_tfidf_keywords",
      // per-document keyword extraction ([[RelevanceFunctions
      // .topTfIdfTerms]]): top-5 terms by tf·ln(N/df) — the
      // corpus-exploration pass that tags what each document is about.
      // The per-doc top-k is capPerGroup's bounded KthSmallest heap on
      // struct(-tfidf, term) (no per-document sort, no window); the
      // oracle replays with a row_number window — semantics must agree
      // exactly, which is the point.
      (s, dir) => R.topTfIdfTerms(docs(s, dir), "doc_id", "text", k = 5)
        .orderBy(col("doc_id"), col("tfidf").desc, col("term")),
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |         unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
             |  FROM documents),
             |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
             |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
             |scored AS (
             |  SELECT tf.doc_id, tf.term,
             |         CAST(tf.tf AS DOUBLE) * ln(n.n / CAST(dfc.df AS DOUBLE)) AS tfidf
             |  FROM tf JOIN dfc USING (term), n),
             |ranked AS (
             |  SELECT doc_id, term, tfidf,
             |         row_number() OVER (PARTITION BY doc_id
             |           ORDER BY tfidf DESC, term) AS rn
             |  FROM scored)
             |SELECT doc_id, term, round(tfidf, 6) AS tfidf FROM ranked
             |WHERE rn <= 5 ORDER BY doc_id, round(tfidf, 6) DESC, term""".stripMargin)),

QueryDef("r4_hybrid_rrf",
      // hybrid retrieval: BM25 keyword top-20 fused with cosine vector
      // top-20 by reciprocal-rank fusion ([[RelevanceFunctions
      // .rrfFuse]], Cormack & Clarke SIGIR 2009) — no score calibration,
      // just 1/(60+rank) per list. The regenerated embeddings table is
      // 1:1 with documents (vec_id = doc_id), so the two rankings share
      // an id space; the vector query is document 0's own embedding
      // (self excluded by the top-k contract). Both engines derive both
      // lists and the fusion end-to-end.
      (s, dir) => {
        val kwW = Window.orderBy(col("bm25").desc, col("doc_id"))
        val kw = R.bm25(docs(s, dir), "doc_id", "text",
            Seq("filter", "stream", "customer"))
          .orderBy(col("bm25").desc, col("doc_id")).limit(20)
          .withColumn("rank", row_number().over(kwW))
          .select("doc_id", "rank")
        val emb = t(s, dir, "embeddings")
        val q0 = emb.filter(col("vec_id") === 0)
          .select(lit(0L).as("query_id"), col("embedding").as("query_vec"))
        val vec = S.bruteForceTopK(emb, q0, 20)
          .select(col("vec_id").as("doc_id"), col("rank"))
        R.rrfFuse(Seq(kw, vec), "doc_id", "rank", topK = 10)
          .orderBy("rank")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w,
             |         CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS dl
             |  FROM documents),
             |st AS (
             |  SELECT CAST(count(*) AS DOUBLE) AS n, CAST(sum(dl) AS DOUBLE) AS sumdl,
             |    CAST(sum(CASE WHEN list_contains(w, 'filter') THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
             |    CAST(sum(CASE WHEN list_contains(w, 'stream') THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
             |    CAST(sum(CASE WHEN list_contains(w, 'customer') THEN 1 ELSE 0 END) AS DOUBLE) AS df2
             |  FROM d),
             |sc AS (
             |  SELECT doc_id,
             |    CAST(len(list_filter(w, x -> x = 'filter')) AS DOUBLE) AS tf0,
             |    CAST(len(list_filter(w, x -> x = 'stream')) AS DOUBLE) AS tf1,
             |    CAST(len(list_filter(w, x -> x = 'customer')) AS DOUBLE) AS tf2,
             |    CAST(dl AS DOUBLE) AS dl, n, sumdl, df0, df1, df2
             |  FROM d, st),
             |bm AS (
             |  SELECT doc_id, round(
             |      ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0)
             |        * (tf0 * (1.2 + 1.0)) / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sumdl / n)))
             |    + ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0)
             |        * (tf1 * (1.2 + 1.0)) / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sumdl / n)))
             |    + ln((n - df2 + 0.5) / (df2 + 0.5) + 1.0)
             |        * (tf2 * (1.2 + 1.0)) / (tf2 + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sumdl / n))),
             |    6) AS bm25
             |  FROM sc),
             |kw AS (
             |  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r
             |  FROM bm ORDER BY bm25 DESC, doc_id LIMIT 20),
             |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
             |vs AS (
             |  SELECT e.vec_id AS doc_id, round(list_cosine_similarity(e.v, q.qv), 6) AS cos
             |  FROM e, q WHERE e.vec_id <> 0),
             |vec AS (
             |  SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS r
             |  FROM vs ORDER BY cos DESC, doc_id LIMIT 20),
             |fused AS (
             |  SELECT coalesce(kw.doc_id, vec.doc_id) AS doc_id,
             |         round(coalesce(1.0 / (60 + kw.r), 0) + coalesce(1.0 / (60 + vec.r), 0), 6) AS rrf
             |  FROM kw FULL OUTER JOIN vec ON kw.doc_id = vec.doc_id),
             |ranked AS (
             |  SELECT doc_id, rrf,
             |         CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INTEGER) AS "rank"
             |  FROM fused)
             |SELECT doc_id, rrf, "rank" FROM ranked
             |WHERE "rank" <= 10 ORDER BY "rank"""".stripMargin)),

QueryDef("eval4_ranking_metrics",
      // NDCG@10 / MRR / recall@10 per query term over the BM25 stack
      // ([[graft.functions.RelevanceFunctions.rankingMetrics]], graded
      // self-relevance = capped term occurrences): one pinned corpus
      // scan for all terms; bounded-heap top-k; 6dp-rounded DCG terms
      // summed in exact decimal.
      (s, dir) => R.rankingMetrics(docs(s, dir), "doc_id", "text",
        Seq("filter", "stream", "customer"), k = 10),
      Some(ndcgOracle(Seq("filter", "stream", "customer"), k = 10, relCap = 4))),

QueryDef("s13_range_search",
      // cosine RANGE search ([[graft.functions.SimilarityFunctions
      // .cosineRangeSearch]]): every corpus vector within radius of
      // each query — fixed radius, unknown k (the dedup-probe /
      // policy-lookup serving mode). Queries broadcast; one narrow
      // corpus scan through the codegen'd VecCosine kernel, no
      // shuffle; 6dp cosines before the cut (the s1 contract).
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        S.cosineRangeSearch(emb, q, threshold = 0.2)
          .orderBy("query_id", "vec_id")
      },
      Some("""WITH q AS (
             |  SELECT vec_id AS query_id, embedding AS query_vec
             |  FROM embeddings WHERE vec_id < 8),
             |scored AS (
             |  SELECT q.query_id, e.vec_id,
             |         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
             |                                      CAST(q.query_vec AS DOUBLE[])), 6) AS cosine
             |  FROM embeddings e, q WHERE e.vec_id <> q.query_id)
             |SELECT query_id, vec_id, cosine FROM scored
             |WHERE cosine >= 0.2 ORDER BY query_id, vec_id""".stripMargin)),

QueryDef("r6_mmr_rerank",
      // MMR diversified reranking ([[graft.functions.RelevanceFunctions
      // .mmrRerank]], λ=0.7): 4 picks from each query's top-10 cosine
      // candidates, greedy λ·rel − (1−λ)·max-sim-to-selected in EXACT
      // DECIMAL (λ scale 3, rel/sims scale 6 → scale-9 scores, no
      // rounding step to straddle). The oracle unrolls the four greedy
      // steps as chained CTEs and derives every pick itself.
      (s, dir) => R.mmrRerank(
        t(s, dir, "embeddings"),
        t(s, dir, "embeddings").filter(col("vec_id") < 4)
          .select(col("vec_id").as("query_id"),
            col("embedding").as("query_vec")),
        topR = 10, k = 4, lambda = 0.7),
      Some {
        val steps = (1 to 4).map { i =>
          val prev = s"sel${i - 1}"
          s"""pick$i AS MATERIALIZED (
             |  SELECT query_id, vec_id, v, rel, mmr FROM (
             |    SELECT c.query_id, c.vec_id, c.v, c.rel,
             |      CAST(CAST(0.700 AS DECIMAL(4,3)) * CAST(c.rel AS DECIMAL(10,6))
             |           - CAST(0.300 AS DECIMAL(4,3)) * coalesce(
             |        (SELECT max(CAST(round(list_cosine_similarity(c.v, s.v), 6)
             |                         AS DECIMAL(10,6)))
             |         FROM $prev s WHERE s.query_id = c.query_id),
             |        CAST(0 AS DECIMAL(10,6))) AS DOUBLE) AS mmr
             |    FROM cand c
             |    WHERE NOT EXISTS (SELECT 1 FROM $prev s
             |      WHERE s.query_id = c.query_id AND s.vec_id = c.vec_id))
             |  QUALIFY row_number() OVER (PARTITION BY query_id
             |                             ORDER BY mmr DESC, vec_id) = 1),
             |sel$i AS MATERIALIZED (
             |  SELECT * FROM sel${i - 1} UNION ALL
             |  SELECT query_id, vec_id, v, rel, mmr, $i AS rank
             |  FROM pick$i)""".stripMargin
        }.mkString(",\n")
        s"""WITH q AS (
           |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           |  FROM embeddings WHERE vec_id < 4),
           |cand AS MATERIALIZED (
           |  SELECT * FROM (
           |    SELECT q.query_id, e.vec_id,
           |      CAST(e.embedding AS DOUBLE[]) AS v,
           |      round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
           |                                   q.qv), 6) AS rel
           |    FROM embeddings e, q WHERE e.vec_id <> q.query_id)
           |  QUALIFY row_number() OVER (PARTITION BY query_id
           |                             ORDER BY rel DESC, vec_id) <= 10),
           |sel0 AS (SELECT query_id, vec_id, v, rel,
           |           CAST(0.0 AS DOUBLE) AS mmr, 0 AS rank
           |         FROM cand WHERE false),
           |$steps
           |SELECT query_id, rank, vec_id, rel, mmr FROM sel4
           |ORDER BY query_id, rank""".stripMargin
      }),

QueryDef("pca1_power_iteration",
      // dominant principal direction of the embedding corpus
      // ([[graft.functions.SimilarityFunctions.topPrincipalComponent]],
      // 3 power-iteration rounds on XᵀX from e₀): per-row dots are
      // scan-local 6dp folds, the matvec accumulates 6dp terms in
      // EXACT DECIMAL onto 64 keys, normalization replays driver-side
      // with an ascending-dim square-sum fold. The oracle unrolls the
      // three rounds as chained array CTEs.
      (s, dir) => S.topPrincipalComponent(
        t(s, dir, "embeddings"), "embedding", dim = 64, iters = 3),
      Some {
        val rounds = (1 to 3).map { r =>
          s"""sc$r AS MATERIALIZED (
             |  SELECT x,
             |    round(list_dot_product(x, (SELECT v FROM v${r - 1})), 6) AS s
             |  FROM emb),
             |w$r AS MATERIALIZED (
             |  SELECT d,
             |    CAST(SUM(CAST(round(x[d] * s, 6) AS DECIMAL(24,6)))
             |         AS DOUBLE) AS w
             |  FROM sc$r, generate_series(1, 64) AS g(d)
             |  GROUP BY 1),
             |n$r AS (
             |  SELECT sqrt(list_aggregate(
             |    list_transform(list(w ORDER BY d), y -> y * y), 'sum')) AS nrm
             |  FROM w$r),
             |v$r AS MATERIALIZED (
             |  SELECT list(round(w / (SELECT nrm FROM n$r), 6) ORDER BY d) AS v
             |  FROM w$r)""".stripMargin
        }.mkString(",\n")
        s"""WITH emb AS (
           |  SELECT CAST(embedding AS DOUBLE[]) AS x FROM embeddings
           |  WHERE embedding IS NOT NULL AND len(embedding) = 64),
           |v0 AS (
           |  SELECT list_transform(generate_series(1, 64),
           |    i -> CAST(CASE WHEN i = 1 THEN 1 ELSE 0 END AS DOUBLE)) AS v),
           |$rounds
           |SELECT CAST(d - 1 AS INTEGER) AS d,
           |  round(w / (SELECT nrm FROM n3), 6) AS loading,
           |  round((SELECT nrm FROM n3), 6) AS sigma
           |FROM w3 ORDER BY d""".stripMargin
      }),

QueryDef("eval5_isotonic",
      // isotonic calibration of the cls1 scores ([[graft.functions
      // .ClassifierFunctions.isotonicCalibration]]): the best MONOTONE
      // bin→rate map via the exact minimax characterization
      // ŷ_k = max_{i≤k} min_{j≥k} avg(i..j) — purely relational (no
      // PAVA fold), every interval average one IEEE division of exact
      // longs, so both engines pick identical extrema. Same score
      // deciles and labels as eval3's reliability diagram.
      (s, dir) => {
        val d = docs(s, dir)
        val labeled = d.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("text"), (col("lang") === "en").as("label"))
        val (w, bias) = Cls.naiveBayesWeights(labeled, "text", "label",
          buckets = 1 << 16, hash = D.md5Hash60)
        val scored = Cls.scoreLinear(d, "doc_id", "text", w, bias,
          buckets = 1 << 16, hash = D.md5Hash60)
        val lab = d.select(col("doc_id"), (col("lang") === "en").cast("long").as("_y"))
        Cls.isotonicCalibration(scored.join(lab, "doc_id"),
          "score", "_y", bins = 10)
      },
      Some("WITH " + nbScoreCtes +
        """,
          |scored AS (
          |  SELECT d.doc_id,
          |    round(1.0 / (1.0 + exp(-(coalesce(sc.m, 0.0) + pr.bias))), 6) AS score,
          |    CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
          |  FROM documents d CROSS JOIN pr LEFT JOIN sc USING (doc_id)),
          |bk AS (
          |  SELECT CAST(least(floor(score * 10), 9) AS INTEGER) AS bucket,
          |    CAST(SUM(y) AS BIGINT) AS sy, count(*) AS n
          |  FROM scored GROUP BY 1),
          |pref AS (
          |  SELECT bucket, sy, n,
          |    CAST(row_number() OVER (ORDER BY bucket) AS BIGINT) AS r,
          |    CAST(SUM(sy) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
          |         AS BIGINT) AS s,
          |    CAST(SUM(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
          |         AS BIGINT) AS nn
          |  FROM bk),
          |bounds AS (SELECT r, s, nn FROM pref
          |           UNION ALL SELECT 0, 0, 0),
          |avgs AS (
          |  SELECT b0.r + 1 AS i, pj.r AS j,
          |    CAST(pj.s - b0.s AS DOUBLE) / CAST(pj.nn - b0.nn AS DOUBLE) AS a
          |  FROM bounds b0 JOIN pref pj ON pj.r > b0.r),
          |inn AS (
          |  SELECT k.r AS k, avgs.i, min(avgs.a) AS ia
          |  FROM pref k JOIN avgs ON avgs.i <= k.r AND avgs.j >= k.r
          |  GROUP BY 1, 2),
          |iso AS (SELECT k, max(ia) AS iso FROM inn GROUP BY 1)
          |SELECT p.bucket, p.n,
          |  round(CAST(p.sy AS DOUBLE) / p.n, 6) AS raw_rate,
          |  round(iso.iso, 6) AS iso_rate
          |FROM pref p JOIN iso ON iso.k = p.r ORDER BY p.bucket""".stripMargin)),

QueryDef("eval6_pr_auc",
      // average precision (PR-AUC) of the cls1 NB scores — the
      // imbalance-honest companion to eval2's ROC-AUC: AP =
      // Σ_t Δrecall·precision over DISTINCT 6dp score thresholds
      // (tie-grouped, so the value is tie-order invariant). Every term
      // is the rational d_pos·TP/(P·TOT) — rounded to 12dp by EXACT
      // INTEGER half-up division (the a32 boundary lesson: count
      // products are routinely pure 2^a·5^b, exactly where float
      // rounding splits engines), summed as longs, final 6dp round in
      // integer too. The threshold window is bounded by the eval set
      // (the rrfFuse convention).
      (s, dir) => {
        val d = docs(s, dir)
        val labeled = d.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("text"), (col("lang") === "en").as("label"))
        val (w, bias) = Cls.naiveBayesWeights(labeled, "text", "label",
          buckets = 1 << 16, hash = D.md5Hash60)
        val scored = Cls.scoreLinear(d, "doc_id", "text", w, bias,
          buckets = 1 << 16, hash = D.md5Hash60)
        val lab = d.select(col("doc_id"), (col("lang") === "en").cast("long").as("_y"))
        val g = scored.join(lab, "doc_id")
          .groupBy("score")
          .agg(sum(col("_y")).as("_dp"), count(lit(1)).as("_dt"))
        val wCum = org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        val p = g.agg(sum(col("_dp")).as("_p"), sum(col("_dt")).as("_n"))
        g.select(col("_dp"),
            sum(col("_dp")).over(wCum).as("_tp"),
            sum(col("_dt")).over(wCum).as("_tot"))
          .filter(col("_dp") > 0)
          .crossJoin(broadcast(p))
          .withColumn("_t12", expr(
            "(2 * CAST(_dp AS DECIMAL(38,0)) * CAST(_tp AS DECIMAL(38,0))" +
            " * 1000000000000 + CAST(_p AS DECIMAL(38,0)) * CAST(_tot AS DECIMAL(38,0)))" +
            " div (2 * CAST(_p AS DECIMAL(38,0)) * CAST(_tot AS DECIMAL(38,0)))"))
          .agg(min(col("_p")).as("_pp"), min(col("_n")).as("_nn"),
            sum(col("_t12")).as("_s12"))
          .select(col("_pp").as("n_pos"), (col("_nn") - col("_pp")).as("n_neg"),
            (expr("(2 * _s12 + 1000000) div 2000000").cast("double") /
              lit(1e6)).as("ap"))
      },
      Some("WITH " + nbScoreCtes +
        """,
          |scored AS (
          |  SELECT d.doc_id,
          |    round(1.0 / (1.0 + exp(-(coalesce(sc.m, 0.0) + pr.bias))), 6) AS score,
          |    CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
          |  FROM documents d CROSS JOIN pr LEFT JOIN sc USING (doc_id)),
          |g AS (
          |  SELECT score, CAST(SUM(y) AS BIGINT) AS dp, count(*) AS dt
          |  FROM scored GROUP BY 1),
          |c AS (
          |  SELECT dp,
          |    CAST(SUM(dp) OVER (ORDER BY score DESC
          |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp,
          |    CAST(SUM(dt) OVER (ORDER BY score DESC
          |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tot
          |  FROM g),
          |p AS (SELECT CAST(SUM(dp) AS BIGINT) AS p,
          |             CAST(SUM(dt) AS BIGINT) AS n FROM g),
          |terms AS (
          |  SELECT (2 * CAST(c.dp AS HUGEINT) * CAST(c.tp AS HUGEINT)
          |            * 1000000000000
          |          + CAST(p.p AS HUGEINT) * CAST(c.tot AS HUGEINT))
          |         // (2 * CAST(p.p AS HUGEINT) * CAST(c.tot AS HUGEINT)) AS t12
          |  FROM c, p WHERE c.dp > 0),
          |s AS (SELECT CAST(SUM(t12) AS BIGINT) AS s12 FROM terms)
          |SELECT p.p AS n_pos, p.n - p.p AS n_neg,
          |  CAST((2 * s.s12 + 1000000) // 2000000 AS DOUBLE) / 1000000.0 AS ap
          |FROM p, s""".stripMargin)),

QueryDef("eval7_kappa",
      // chance-corrected agreement of the langid heuristic vs the gold
      // labels: Cohen's kappa + macro-F1 over eval1's confusion matrix
      // (the single-scalar pair eval1's per-cell view doesn't give).
      // The matrix is langs²-sized and pinned once; every statistic is
      // a ratio of EXACT integer sums shipped as ONE unrounded IEEE
      // division chain (the w22 rule: raw quotients replay bit-for-bit
      // — rounding near count-product boundaries is what flips).
      // Per-class F1 quantizes through exact integer micro-units
      // before the macro mean so the sum order can't leak.
      (s, dir) => {
        val cells = graft.Caches.trackedPersist(
          docs(s, dir)
            .select(col("lang").as("gold"),
              T.languageId(col("text")).as("pred"))
            .groupBy("gold", "pred").agg(count(lit(1)).as("n")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val rows = cells.groupBy(col("gold").as("cls")).agg(sum("n").as("_row"))
        val cols = cells.groupBy(col("pred").as("cls")).agg(sum("n").as("_col"))
        val diag = cells.filter(col("gold") === col("pred"))
          .select(col("gold").as("cls"), col("n").as("_tp"))
        val perClass = rows
          .join(cols, Seq("cls"), "left")
          .join(diag, Seq("cls"), "left")
          .select(col("cls"), col("_row"),
            coalesce(col("_col"), lit(0L)).as("_colf"),
            coalesce(col("_tp"), lit(0L)).as("_tpf"))
          .withColumn("_f1u", expr(
            "(2 * (2 * _tpf) * 1000000 + (_row + _colf)) div (2 * (_row + _colf))"))
        val peNum = rows.join(cols, Seq("cls"), "full")
          .agg(sum(coalesce(col("_row"), lit(0L)) *
            coalesce(col("_col"), lit(0L))).as("_pe"))
        val base = cells.agg(sum("n").as("_n"),
          sum(when(col("gold") === col("pred"), col("n"))).as("_diag"))
        val macros = perClass.agg(count(lit(1)).as("_k"), sum("_f1u").as("_f1s"))
        base.crossJoin(broadcast(peNum)).crossJoin(broadcast(macros))
          .withColumn("_po", col("_diag").cast("double") / col("_n").cast("double"))
          .withColumn("_pex", col("_pe").cast("double") /
            (col("_n") * col("_n")).cast("double"))
          .select(col("_n").as("n"), col("_k").as("n_classes"),
            col("_po").as("accuracy"),
            col("_pex").as("expected_accuracy"),
            ((col("_po") - col("_pex")) / (lit(1.0) - col("_pex"))).as("kappa"),
            (col("_f1s").cast("double") /
              (col("_k") * lit(1000000L)).cast("double")).as("macro_f1"))
      },
      Some(raw"""WITH t AS (
             |  SELECT doc_id, lang,
             |         regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM documents),
             |h AS (SELECT doc_id, lang,
             |  len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','ein','mit','auf','zu'], x))) AS h_de,
             |  len(list_filter(toks, x -> list_contains(['the','and','of','to','is','in','that','it','was','for'], x))) AS h_en,
             |  len(list_filter(toks, x -> list_contains(['el','la','los','las','es','una','por','para','que','con'], x))) AS h_es,
             |  len(list_filter(toks, x -> list_contains(['le','la','les','et','est','une','pour','dans','que','des'], x))) AS h_fr
             |FROM t),
             |pd AS (SELECT doc_id, lang AS gold,
             |  CASE WHEN greatest(h_de, h_en, h_es, h_fr) <= 0 THEN 'und'
             |       WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
             |       WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
             |       WHEN h_es >= h_fr THEN 'es'
             |       ELSE 'fr' END AS pred
             |FROM h),
             |cells AS (SELECT gold, pred, count(*) AS n FROM pd GROUP BY 1, 2),
             |rws AS (SELECT gold AS cls, CAST(SUM(n) AS BIGINT) AS r
             |        FROM cells GROUP BY 1),
             |cls AS (SELECT pred AS cls, CAST(SUM(n) AS BIGINT) AS c
             |        FROM cells GROUP BY 1),
             |dg AS (SELECT gold AS cls, n AS tp FROM cells WHERE gold = pred),
             |pc AS (
             |  SELECT rws.cls, rws.r, coalesce(cls.c, 0) AS c,
             |    coalesce(dg.tp, 0) AS tp
             |  FROM rws LEFT JOIN cls USING (cls) LEFT JOIN dg USING (cls)),
             |f1 AS (
             |  SELECT cls,
             |    (2 * (2 * tp) * 1000000 + (r + c)) // (2 * (r + c)) AS f1u
             |  FROM pc),
             |pe AS (
             |  SELECT CAST(SUM(coalesce(rws.r, 0) * coalesce(cls.c, 0)) AS BIGINT)
             |    AS pe
             |  FROM rws FULL JOIN cls USING (cls)),
             |base AS (
             |  SELECT CAST(SUM(n) AS BIGINT) AS n,
             |    CAST(SUM(CASE WHEN gold = pred THEN n ELSE 0 END) AS BIGINT)
             |      AS diag
             |  FROM cells),
             |mac AS (SELECT count(*) AS k, CAST(SUM(f1u) AS BIGINT) AS f1s FROM f1)
             |SELECT base.n, mac.k AS n_classes,
             |  CAST(base.diag AS DOUBLE) / CAST(base.n AS DOUBLE) AS accuracy,
             |  CAST(pe.pe AS DOUBLE) / CAST(base.n * base.n AS DOUBLE)
             |    AS expected_accuracy,
             |  (CAST(base.diag AS DOUBLE) / CAST(base.n AS DOUBLE)
             |   - CAST(pe.pe AS DOUBLE) / CAST(base.n * base.n AS DOUBLE))
             |  / (1.0 - CAST(pe.pe AS DOUBLE) / CAST(base.n * base.n AS DOUBLE))
             |    AS kappa,
             |  CAST(mac.f1s AS DOUBLE) / CAST(mac.k * 1000000 AS DOUBLE)
             |    AS macro_f1
             |FROM base, pe, mac""".stripMargin)),

QueryDef("eval8_lift",
      // decile lift & cumulative-gains table for the cls1 scores — the
      // campaign-targeting eval ("how concentrated are the positives in
      // the top-scored slices?"). Deciles come from ntile(10) over a
      // TOTAL order (score desc, doc_id — both engines split remainders
      // identically); every reported ratio is one unrounded IEEE
      // division of exact long products (< 2^53). The global ntile is
      // bounded by the eval set (the rrfFuse convention).
      (s, dir) => {
        val d = docs(s, dir)
        val labeled = d.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("text"), (col("lang") === "en").as("label"))
        val (w, bias) = Cls.naiveBayesWeights(labeled, "text", "label",
          buckets = 1 << 16, hash = D.md5Hash60)
        val scored = Cls.scoreLinear(d, "doc_id", "text", w, bias,
          buckets = 1 << 16, hash = D.md5Hash60)
        val lab = d.select(col("doc_id"), (col("lang") === "en").cast("long").as("_y"))
        // deciles from the distributed exact rank + the ntile fill
        // rule (the seg1 shape — no single-partition ntile window);
        // pinned: the count and the ranking's three input evaluations
        // read the scored join
        val base = graft.Caches.trackedPersist(
          scored.join(lab, "doc_id")
            .select(col("doc_id"), col("score"), col("_y")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nn = base.agg(count(lit(1)).as("_n"))
        val deciles = graft.ops.RankOps.withGlobalRank(base,
            Seq(col("score").desc, col("doc_id")), "_rn")
          .crossJoin(broadcast(nn))
          .withColumn("decile", ntileFromRank("_rn", "_n", 10))
          .groupBy("decile")
          .agg(count(lit(1)).as("n"), sum(col("_y")).as("n_pos"))
        val tot = deciles.agg(sum("n").as("_nn"), sum("n_pos").as("_pp"))
        val wCum = org.apache.spark.sql.expressions.Window
          .orderBy("decile")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        deciles
          .withColumn("_cum", sum(col("n_pos")).over(wCum))
          .crossJoin(broadcast(tot))
          .select(col("decile"), col("n"), col("n_pos"),
            (col("n_pos").cast("double") / col("n").cast("double")).as("pos_rate"),
            ((col("n_pos") * col("_nn")).cast("double") /
              (col("n") * col("_pp")).cast("double")).as("lift"),
            (col("_cum").cast("double") / col("_pp").cast("double")).as("cum_gain"))
          .orderBy("decile")
      },
      Some("WITH " + nbScoreCtes +
        """,
          |scored AS (
          |  SELECT d.doc_id,
          |    round(1.0 / (1.0 + exp(-(coalesce(sc.m, 0.0) + pr.bias))), 6) AS score,
          |    CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
          |  FROM documents d CROSS JOIN pr LEFT JOIN sc USING (doc_id)),
          |dec AS (
          |  SELECT CAST(ntile(10) OVER (ORDER BY score DESC, doc_id)
          |              AS INTEGER) AS decile, y
          |  FROM scored),
          |g AS (
          |  SELECT decile, count(*) AS n, CAST(SUM(y) AS BIGINT) AS n_pos
          |  FROM dec GROUP BY 1),
          |tt AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
          |              CAST(SUM(n_pos) AS BIGINT) AS pp FROM g),
          |c AS (
          |  SELECT decile, n, n_pos,
          |    CAST(SUM(n_pos) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
          |         AS BIGINT) AS cum
          |  FROM g)
          |SELECT decile, n, n_pos,
          |  CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS pos_rate,
          |  CAST(n_pos * tt.nn AS DOUBLE) / CAST(n * tt.pp AS DOUBLE) AS lift,
          |  CAST(cum AS DOUBLE) / CAST(tt.pp AS DOUBLE) AS cum_gain
          |FROM c, tt ORDER BY decile""".stripMargin)),

QueryDef("ab1_proportion_ztest",
      // two-proportion z-test on a hash-split A/B assignment: variant =
      // user_id parity, success = the user ever makes a HIGH-VALUE
      // purchase (value > 195 — "ever purchases" is degenerate here:
      // every user converts, pooled SE = 0). The experimentation
      // primitive next to a33's Welch t (means) and a28's chi-square
      // (independence). Counts are exact longs; p̂s, the pooled SE and
      // z are a FIXED IEEE chain over exact casts (the a13 contract),
      // rounded 6dp; a degenerate 0%/100% pool yields NULL z in both
      // engines rather than an ANSI divide-by-zero.
      (s, dir) => {
        val conv = events(s, dir).groupBy("user_id")
          .agg(max(when(col("event_type") === "purchase" &&
            col("value") > 195, 1L).otherwise(0L)).as("c"))
          .withColumn("v", col("user_id") % 2)
        // pinned 2-row frame: both variant filters read it — unpinned
        // the per-user agg over the log runs twice
        val a = graft.Caches.trackedPersist(conv.groupBy("v")
          .agg(count(lit(1)).as("n"), sum(col("c")).as("x")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val wide = a.filter(col("v") === 0)
          .select(col("n").as("n_a"), col("x").as("conv_a"))
          .crossJoin(a.filter(col("v") === 1)
            .select(col("n").as("n_b"), col("x").as("conv_b")))
        val pa = col("conv_a").cast("double") / col("n_a").cast("double")
        val pb = col("conv_b").cast("double") / col("n_b").cast("double")
        val pp = (col("conv_a") + col("conv_b")).cast("double") /
          (col("n_a") + col("n_b")).cast("double")
        val se = sqrt(pp * (lit(1.0) - pp) *
          (lit(1.0) / col("n_a").cast("double") +
            lit(1.0) / col("n_b").cast("double")))
        val tot = col("conv_a") + col("conv_b")
        wide.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
          round(pa, 6).as("p_a"), round(pb, 6).as("p_b"),
          when(tot > 0 && tot < col("n_a") + col("n_b"),
            round((pa - pb) / se, 6)).as("z"))
      },
      Some("""WITH c AS (
             |  SELECT user_id, user_id % 2 AS v,
             |    max(CASE WHEN event_type = 'purchase' AND value > 195
             |        THEN 1 ELSE 0 END) AS cv
             |  FROM events GROUP BY 1),
             |a AS (SELECT v, count(*) AS n, CAST(sum(cv) AS BIGINT) AS x
             |      FROM c GROUP BY 1),
             |w AS (
             |  SELECT a0.n AS n_a, a0.x AS conv_a, a1.n AS n_b, a1.x AS conv_b
             |  FROM (SELECT n, x FROM a WHERE v = 0) a0,
             |       (SELECT n, x FROM a WHERE v = 1) a1)
             |SELECT n_a, conv_a, n_b, conv_b,
             |  round(CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS p_a,
             |  round(CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS p_b,
             |  CASE WHEN conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b THEN
             |  round((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
             |       - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
             |    / sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
             |      * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
             |      * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 6)
             |  END AS z
             |FROM w""".stripMargin)),

QueryDef("s14_rocchio",
      // Rocchio nearest-centroid classification over the labeled
      // embeddings: per-label centroids via the s5 explode+hash-agg
      // pooling (6dp — the float-aggregate contract), then every
      // vector scores against the 10 broadcast centroids and takes the
      // highest 6dp cosine (ties to lower label). The lightest vector
      // classifier — the label-space companion to s10's KNN vote, one
      // scan per phase, nothing corpus-sized shuffled.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val cent = S.assembleVec(
          S.meanPoolFlat(emb.select(col("label"), col("embedding")),
              "label", "embedding")
            .select(col("label").as("clabel"), col("pos"),
              round(col("mean_v"), 6).as("mean_v")),
          "clabel")
        emb.crossJoin(broadcast(cent))
          .withColumn("cos",
            round(S.cosine(col("embedding").cast("array<double>"), col("vec")), 6))
          .withColumn("rn", row_number().over(Window.partitionBy("vec_id")
            .orderBy(col("cos").desc, col("clabel"))))
          .filter(col("rn") === 1)
          .select(col("vec_id"), col("label"), col("clabel").as("pred"), col("cos"))
          .orderBy("vec_id")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings),
             |flat AS (
             |  SELECT label, generate_subscripts(v, 1) AS pos, unnest(v) AS val
             |  FROM e),
             |cd AS (SELECT label AS clabel, pos, round(avg(val), 6) AS cv
             |       FROM flat GROUP BY 1, 2),
             |cent AS (SELECT clabel, list(cv ORDER BY pos) AS cvec
             |         FROM cd GROUP BY 1),
             |sc AS (
             |  SELECT e.vec_id, e.label, c.clabel,
             |         round(list_cosine_similarity(e.v, c.cvec), 6) AS cos
             |  FROM e CROSS JOIN cent c),
             |best AS (
             |  SELECT vec_id, label, clabel, cos,
             |    row_number() OVER (PARTITION BY vec_id
             |      ORDER BY cos DESC, clabel) AS rn
             |  FROM sc)
             |SELECT vec_id, label, clabel AS pred, cos
             |FROM best WHERE rn = 1 ORDER BY vec_id""".stripMargin)),

QueryDef("split1_stump",
      // exact decision-stump split finding over the labeled embeddings
      // (dims 0–3): for every distinct-value boundary of each feature,
      // the weighted MISCLASSIFICATION count of the "x ≤ t" split —
      // the GBDT/tree split-finder primitive, with misclassification
      // (not Gini) as the objective precisely because it is an exact
      // INTEGER: argmin needs no cross-engine rational comparison.
      // Per-dim sorted windows build cumulative per-class counts in one
      // pass (10 running sums over one sort); tied feature values
      // can't host a split, so only rows where x < next(x) are
      // candidates; best-per-dim ties break (err, threshold).
      (s, dir) => {
        val labels = 0 to 9
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), col("label"),
            posexplode(col("embedding").cast("array<double>")))
          .filter(col("pos") < 4)
          .select(col("vec_id"), col("label"), col("pos").as("dim"),
            col("col").as("x"))
        val w = Window.partitionBy("dim").orderBy(col("x"), col("vec_id"))
          .rowsBetween(Window.unboundedPreceding, 0)
        val wl = Window.partitionBy("dim").orderBy(col("x"), col("vec_id"))
        var d = e
        for (c <- labels)
          d = d.withColumn(s"_c$c",
            sum(when(col("label") === c, 1L).otherwise(0L)).over(w))
        for (c <- labels)
          d = d.withColumn(s"_t$c", max(col(s"_c$c")).over(
            Window.partitionBy("dim")))
        d = d.withColumn("_rn", row_number().over(wl))
          .withColumn("_n", count(lit(1)).over(Window.partitionBy("dim")))
          .withColumn("_nx", lead(col("x"), 1).over(wl))
          .filter(col("_nx").isNotNull && col("x") < col("_nx"))
        val lmax = greatest(labels.map(c => col(s"_c$c")): _*)
        val rmax = greatest(labels.map(c => col(s"_t$c") - col(s"_c$c")): _*)
        val scored = d.withColumn("err",
            (col("_rn") - lmax) + (col("_n") - col("_rn") - rmax))
          .withColumn("_best", row_number().over(Window.partitionBy("dim")
            .orderBy(col("err"), col("x"), col("vec_id"))))
          .filter(col("_best") === 1)
        scored.select(col("dim"), col("x").as("threshold"),
            col("_rn").cast("long").as("n_left"), col("_n").as("n"),
            col("err").cast("long").as("err"))
          .orderBy("dim")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, label, generate_subscripts(v, 1) - 1 AS dim,
             |         unnest(v) AS x
             |  FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
             |        FROM embeddings)),
             |f AS (SELECT * FROM e WHERE dim < 4),
             |cum AS (
             |  SELECT vec_id, dim, x,
             |""".stripMargin +
        (0 to 9).map(c =>
          s"""    sum(CASE WHEN label = $c THEN 1 ELSE 0 END) OVER w AS c$c,
             |    CAST(sum(CASE WHEN label = $c THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY dim) AS BIGINT) AS t$c""".stripMargin)
          .mkString(",\n") + """,
             |    row_number() OVER wo AS rn,
             |    count(*) OVER (PARTITION BY dim) AS n,
             |    lead(x) OVER wo AS nx
             |  FROM f
             |  WINDOW w AS (PARTITION BY dim ORDER BY x, vec_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |  wo AS (PARTITION BY dim ORDER BY x, vec_id)),
             |cand AS (
             |  SELECT dim, x, vec_id, rn, n,
             |    (rn - greatest(c0,c1,c2,c3,c4,c5,c6,c7,c8,c9))
             |    + (n - rn - greatest(t0-c0,t1-c1,t2-c2,t3-c3,t4-c4,
             |        t5-c5,t6-c6,t7-c7,t8-c8,t9-c9)) AS err
             |  FROM cum WHERE nx IS NOT NULL AND x < nx),
             |best AS (
             |  SELECT dim, x, rn, n, err,
             |    row_number() OVER (PARTITION BY dim
             |      ORDER BY err, x, vec_id) AS b
             |  FROM cand)
             |SELECT CAST(dim AS INTEGER) AS dim, x AS threshold,
             |  CAST(rn AS BIGINT) AS n_left, CAST(n AS BIGINT) AS n,
             |  CAST(err AS BIGINT) AS err
             |FROM best WHERE b = 1 ORDER BY dim""".stripMargin)),

QueryDef("eval9_ece",
      // expected calibration error: eval3's reliability diagram rolled
      // up to ONE number, ECE = Σ_b (n_b/N)·|observed − predicted| —
      // the miscalibration scalar a model card quotes. Both per-bucket
      // rates enter as their 6dp-ROUNDED decimals (eval3's published
      // values), so the weighted |gap| sum is exact decimal and the
      // final /N the only IEEE op.
      (s, dir) => {
        val d = docs(s, dir)
        val labeled = d.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("text"), (col("lang") === "en").as("label"))
        val (w, bias) = Cls.naiveBayesWeights(labeled, "text", "label",
          buckets = 1 << 16, hash = D.md5Hash60)
        val scored = Cls.scoreLinear(d, "doc_id", "text", w, bias,
          buckets = 1 << 16, hash = D.md5Hash60)
        val lab = d.select(col("doc_id"), (col("lang") === "en").cast("long").as("_y"))
        val buckets = scored.join(lab, "doc_id")
          .groupBy(least(floor(col("score") * 10), lit(9)).cast("int").as("bucket"))
          .agg(count(lit(1)).as("n"),
            round(avg(col("score")), 6).cast("decimal(10,6)").as("_ms"),
            (round(sum(col("_y")).cast("double") / count(lit(1)), 6))
              .cast("decimal(10,6)").as("_fp"))
        buckets.agg(count(lit(1)).as("n_buckets"), sum(col("n")).as("n_docs"),
            round(sum(col("n") * abs(col("_fp") - col("_ms"))).cast("double") /
              sum(col("n")).cast("double"), 6).as("ece"))
      },
      Some("WITH " + nbScoreCtes +
        """,
          |scored AS (
          |  SELECT d.doc_id,
          |    round(1.0 / (1.0 + exp(-(coalesce(sc.m, 0.0) + pr.bias))), 6) AS score,
          |    CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
          |  FROM documents d CROSS JOIN pr LEFT JOIN sc USING (doc_id)),
          |b AS (
          |  SELECT least(floor(score * 10), 9) AS bucket, count(*) AS n,
          |    CAST(round(avg(score), 6) AS DECIMAL(10,6)) AS ms,
          |    CAST(round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS DECIMAL(10,6))
          |      AS fp
          |  FROM scored GROUP BY 1)
          |SELECT count(*) AS n_buckets, CAST(sum(n) AS BIGINT) AS n_docs,
          |  round(CAST(sum(n * abs(fp - ms)) AS DOUBLE)
          |    / CAST(sum(n) AS DOUBLE), 6) AS ece
          |FROM b""".stripMargin)),

QueryDef("r8_maxsim_late_interaction",
      // ColBERT-style late-interaction retrieval ([[RelevanceFunctions
      // .maxSimTopK]], Khattab & Zaharia SIGIR 2020) over the chunk
      // convention (vec_id div 10 = doc, vec_id % 10 = chunk): each
      // query chunk takes its best corpus-chunk cosine within a doc,
      // the per-doc sum ranks docs — multi-aspect precision a pooled
      // single vector (s5→s1) flattens. Query docs 0–1 (20 chunks,
      // broadcast); one corpus-chunk scan into two hash aggs + the
      // bounded-heap top-k. 6dp rounds before max and after sum,
      // lower-id ties, self-doc excluded — the oracle replays both
      // aggregation levels and the rank.
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(expr("vec_id div 10").as("doc_id"),
            (col("vec_id") % 10).as("chunk_id"), col("embedding"))
        val q = e.filter(col("doc_id") < 2)
          .select(col("doc_id").as("query_doc"), col("chunk_id"),
            col("embedding").as("query_vec"))
        R.maxSimTopK(e, q, k = 10).orderBy("query_doc", "rank")
      },
      Some("""WITH e AS (
             |  SELECT vec_id // 10 AS doc_id, vec_id % 10 AS chunk_id,
             |         CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings),
             |q AS (SELECT doc_id AS query_doc, chunk_id, v AS qv FROM e WHERE doc_id < 2),
             |pc AS (
             |  SELECT c.doc_id AS d, q.query_doc, q.chunk_id,
             |         max(round(list_cosine_similarity(c.v, q.qv), 6)) AS m
             |  FROM e c, q WHERE c.doc_id <> q.query_doc
             |  GROUP BY 1, 2, 3),
             |s AS (SELECT query_doc, d AS doc_id, round(SUM(m), 6) AS maxsim
             |      FROM pc GROUP BY 1, 2),
             |r AS (SELECT query_doc, doc_id, maxsim,
             |        CAST(row_number() OVER (PARTITION BY query_doc
             |          ORDER BY maxsim DESC, doc_id) AS INTEGER) AS "rank"
             |      FROM s)
             |SELECT query_doc, doc_id, maxsim, "rank" FROM r WHERE "rank" <= 10
             |ORDER BY query_doc, "rank"""".stripMargin)),

QueryDef("r7_prf_expansion",
      // pseudo-relevance feedback (Rocchio PRF): score the corpus for
      // the seed query, take the top-5 documents, mine their 3
      // strongest expansion terms (Σtf·ln(N/df), common-term gate
      // 2·df < N, seed terms excluded), and re-score with the expanded
      // query — the classic recall-repair loop composed from
      // [[RelevanceFunctions.bm25Join]] (the DYNAMIC-term BM25: per-
      // term contributions round 6dp and sum in exact decimal, so the
      // data-dependent term set keeps cross-engine determinism). The
      // oracle derives its own candidates and expansion terms (the
      // bpe/g1 pattern). Term selection argmaxes on the ROUNDED score
      // with a term tiebreak.
      (s, dir) => {
        val d = docs(s, dir)
        val q0 = s.sql("SELECT * FROM (VALUES ('filter'), ('stream')) AS t(term)")
        val score0 = graft.Caches.trackedPersist(
          R.bm25Join(d, "doc_id", "text", q0),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val cand = score0.orderBy(col("bm25j").desc, col("doc_id"))
          .limit(5).select("doc_id")
        val toks = graft.Caches.trackedPersist(d.select(col("doc_id"),
            explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
          .filter(length(col("term")) > 0),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nDocs = d.agg(count(lit(1)).as("_n"))
        val tic = toks.join(broadcast(cand), "doc_id")
          .groupBy("term").agg(count(lit(1)).as("_tfsum"))
        val dfe = toks.select("doc_id", "term").distinct()
          .join(broadcast(tic.select("term")), "term")
          .groupBy("term").agg(count(lit(1)).as("_df"))
        val exp = tic.join(dfe, "term").crossJoin(broadcast(nDocs))
          .filter(!col("term").isin("filter", "stream") &&
            col("_df") * 2 < col("_n"))
          .select(col("term"), round(col("_tfsum").cast("double") *
            log(col("_n").cast("double") / col("_df").cast("double")), 6)
            .as("_sc"))
          .orderBy(col("_sc").desc, col("term")).limit(3).select("term")
        val score1 = R.bm25Join(d, "doc_id", "text", q0.unionByName(exp))
        score0.select(col("doc_id"), col("bm25j").as("bm25_seed"))
          .join(score1.select(col("doc_id"), col("bm25j").as("bm25_prf")),
            Seq("doc_id"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id,
             |    string_split_regex(lower(trim(text)), '\s+') AS w,
             |    CAST(len(string_split_regex(lower(trim(text)), '\s+'))
             |      AS BIGINT) AS dl
             |  FROM documents),
             |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
             |              CAST(sum(dl) AS DOUBLE) AS sumdl FROM d),
             |nd AS (SELECT count(*) AS n FROM d),
             |q0 AS (SELECT unnest(['filter', 'stream']) AS term),
             |tok AS (
             |  SELECT doc_id, dl, unnest(w) AS term FROM d),
             |tokf AS (SELECT * FROM tok WHERE length(term) > 0),
             |tf0 AS (
             |  SELECT doc_id, term, dl, count(*) AS tf
             |  FROM tok JOIN q0 USING (term) GROUP BY 1, 2, 3),
             |df0 AS (SELECT term, count(*) AS df FROM tf0 GROUP BY 1),
             |c0 AS (
             |  SELECT tf0.doc_id,
             |    CAST(round(ln((st.n - df0.df + 0.5) / (df0.df + 0.5) + 1.0)
             |      * (tf0.tf * 2.2)
             |      / (tf0.tf + 1.2 * (0.25 + 0.75 * tf0.dl / (st.sumdl / st.n))),
             |      6) AS DECIMAL(16,6)) AS c
             |  FROM tf0 JOIN df0 USING (term) CROSS JOIN st),
             |s0 AS (
             |  SELECT d.doc_id,
             |    COALESCE(CAST(sum(c0.c) AS DOUBLE), 0.0) AS bm25_seed
             |  FROM d LEFT JOIN c0 USING (doc_id) GROUP BY 1),
             |cand AS (SELECT doc_id FROM s0
             |         ORDER BY bm25_seed DESC, doc_id LIMIT 5),
             |tic AS (
             |  SELECT term, count(*) AS tfsum
             |  FROM tokf JOIN cand USING (doc_id) GROUP BY 1),
             |dfe AS (
             |  SELECT tokf.term, count(DISTINCT tokf.doc_id) AS df
             |  FROM tokf JOIN (SELECT DISTINCT term FROM tic) t USING (term)
             |  GROUP BY 1),
             |exp AS (
             |  SELECT term FROM (
             |    SELECT tic.term,
             |      round(tic.tfsum * ln(CAST(nd.n AS DOUBLE) / dfe.df), 6) AS sc,
             |      dfe.df, nd.n
             |    FROM tic JOIN dfe USING (term) CROSS JOIN nd)
             |  WHERE term NOT IN ('filter', 'stream') AND 2 * df < n
             |  ORDER BY sc DESC, term LIMIT 3),
             |terms AS (SELECT term FROM q0 UNION ALL SELECT term FROM exp),
             |tf1 AS (
             |  SELECT doc_id, term, dl, count(*) AS tf
             |  FROM tok JOIN terms USING (term) GROUP BY 1, 2, 3),
             |df1 AS (SELECT term, count(*) AS df FROM tf1 GROUP BY 1),
             |c1 AS (
             |  SELECT tf1.doc_id,
             |    CAST(round(ln((st.n - df1.df + 0.5) / (df1.df + 0.5) + 1.0)
             |      * (tf1.tf * 2.2)
             |      / (tf1.tf + 1.2 * (0.25 + 0.75 * tf1.dl / (st.sumdl / st.n))),
             |      6) AS DECIMAL(16,6)) AS c
             |  FROM tf1 JOIN df1 USING (term) CROSS JOIN st),
             |s1 AS (
             |  SELECT d.doc_id,
             |    COALESCE(CAST(sum(c1.c) AS DOUBLE), 0.0) AS bm25_prf
             |  FROM d LEFT JOIN c1 USING (doc_id) GROUP BY 1)
             |SELECT s0.doc_id, s0.bm25_seed, s1.bm25_prf
             |FROM s0 JOIN s1 USING (doc_id) ORDER BY doc_id""".stripMargin)),

QueryDef("s15_centroid_drift",
      // semantic drift between splits: pool each split's embeddings to
      // a 6dp centroid (the s5 shape), report the cross-centroid
      // cosine and each centroid's norm — the embedding-space twin of
      // mix2's source-KL audit ("did the valid slice land in the same
      // region as train"). Norms use VecDot over the 6dp centroid in
      // ARRAY ORDER, mirrored by the oracle's in-order list fold —
      // both engines run the identical sum sequence.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
          .withColumn("split",
            when(col("vec_id") % 5 === 0, "valid").otherwise("train"))
        val sizes = emb.groupBy("split").agg(count(lit(1)).as("n"))
        val cent = S.assembleVec(
          S.meanPoolFlat(emb.select(col("split"), col("embedding")),
              "split", "embedding")
            .select(col("split"), col("pos"),
              round(col("mean_v"), 6).as("mean_v")),
          "split")
          .join(broadcast(sizes), "split")
        val a = cent.filter(col("split") === "train")
          .select(col("vec").as("_va"), col("n").as("n_train"))
        val b = cent.filter(col("split") === "valid")
          .select(col("vec").as("_vb"), col("n").as("n_valid"))
        a.crossJoin(b).select(col("n_train"), col("n_valid"),
          round(S.cosine(col("_va"), col("_vb")), 6).as("centroid_cosine"),
          round(sqrt(S.dot(col("_va"), col("_va"))), 6).as("norm_train"),
          round(sqrt(S.dot(col("_vb"), col("_vb"))), 6).as("norm_valid"))
      },
      Some("""WITH e AS (
             |  SELECT CASE WHEN vec_id % 5 = 0 THEN 'valid' ELSE 'train' END
             |           AS split,
             |         CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings),
             |sz AS (SELECT split, count(*) AS n FROM e GROUP BY 1),
             |flat AS (
             |  SELECT split, generate_subscripts(v, 1) AS pos, unnest(v) AS val
             |  FROM e),
             |cd AS (SELECT split, pos, round(avg(val), 6) AS cv
             |       FROM flat GROUP BY 1, 2),
             |cent AS (SELECT split, list(cv ORDER BY pos) AS vec
             |         FROM cd GROUP BY 1),
             |a AS (SELECT cent.vec AS va, sz.n AS n_train FROM cent
             |      JOIN sz USING (split) WHERE cent.split = 'train'),
             |b AS (SELECT cent.vec AS vb, sz.n AS n_valid FROM cent
             |      JOIN sz USING (split) WHERE cent.split = 'valid')
             |SELECT a.n_train, b.n_valid,
             |  round(list_cosine_similarity(a.va, b.vb), 6) AS centroid_cosine,
             |  round(sqrt(list_aggregate(list_transform(a.va, x -> x * x),
             |    'sum')), 6) AS norm_train,
             |  round(sqrt(list_aggregate(list_transform(b.vb, x -> x * x),
             |    'sum')), 6) AS norm_valid
             |FROM a CROSS JOIN b""".stripMargin)),

QueryDef("s16_eps_selection",
      // ε-selection data for d28's DBSCAN: every vector's cosine to
      // its 5th nearest neighbor, summarized as exact decile ORDER
      // STATISTICS — the "knee plot" that picks the density threshold
      // before clustering (Ester 1996 §4.2's sorted k-dist graph).
      // 5NN similarities are s1's 6dp cosines (exact picks, ties by
      // id); deciles are ⌈d·n/10⌉ ranks — no interpolation anywhere.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = emb.select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
        // pinned: the count and the distributed ranking's three input
        // evaluations read the 5NN frame (the qq1 shape — no
        // single-partition window)
        val fifth = graft.Caches.trackedPersist(
          S.bruteForceTopK(emb, q, 5)
            .filter(col("rank") === 5)
            .select(col("query_id"), col("cosine").cast("decimal(10,6)").as("c5")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nn = fifth.agg(count(lit(1)).as("_n"))
        val ranked = graft.ops.RankOps.withGlobalRank(fifth,
            Seq(col("c5"), col("query_id")), "_rn")
          .crossJoin(broadcast(nn))
        ranked.join(broadcast(s.range(1, 10)
            .select(col("id").cast("int").as("decile"))),
            col("_rn") === expr("(decile * _n + 9) div 10"))
          .select(col("decile"), col("c5").cast("double").as("knn5_cosine"))
          .orderBy("decile")
      },
      Some("""WITH q AS (
             |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
             |  FROM embeddings),
             |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |      FROM embeddings),
             |scored AS (
             |  SELECT q.query_id, e.vec_id,
             |         round(list_cosine_similarity(e.v, q.qv), 6) AS cosine
             |  FROM e, q WHERE e.vec_id <> q.query_id),
             |r5 AS (
             |  SELECT query_id,
             |    CAST(cosine AS DECIMAL(10,6)) AS c5,
             |    row_number() OVER (PARTITION BY query_id
             |      ORDER BY cosine DESC, vec_id) AS rk
             |  FROM scored),
             |f AS (SELECT query_id, c5 FROM r5 WHERE rk = 5),
             |rk2 AS (
             |  SELECT query_id, c5,
             |    row_number() OVER (ORDER BY c5, query_id) AS rn,
             |    count(*) OVER () AS n
             |  FROM f),
             |d AS (SELECT unnest([1,2,3,4,5,6,7,8,9]) AS decile)
             |SELECT d.decile, CAST(rk2.c5 AS DOUBLE) AS knn5_cosine
             |FROM rk2 JOIN d ON rk2.rn = (d.decile * rk2.n + 9) // 10
             |ORDER BY decile""".stripMargin)),

QueryDef("s16b_eps_sampled",
      // the PRODUCTION path for s16's k-dist ε-selection (s16 stays
      // as the exact audit baseline): ε needs a SAMPLE, not the
      // population — Ester 1996 §4.2 reads the knee off a sorted
      // k-dist plot, whose shape is stable under uniform query
      // sampling — so the QUERY side is an md5-bucketed 1/16 subset
      // (engine-replayable, the d6 sampling contract) while the
      // CORPUS side stays full: true 5NN cosines, |sample|×|corpus|
      // work instead of |corpus|² — the difference between an audit
      // and an affordable tuning step at 100 TB. Same exact decile
      // order statistics as s16, over the sampled k-dist set.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = emb.filter(Sam.hashBucket(
            col("vec_id").cast("string"), 16, D.md5Hash60) === 0)
          .select(col("vec_id").as("query_id"),
            col("embedding").as("query_vec"))
        // pinned: the count and the distributed ranking's input
        // evaluations read the sampled 5NN frame (the s16 shape)
        val fifth = graft.Caches.trackedPersist(
          S.bruteForceTopK(emb, q, 5)
            .filter(col("rank") === 5)
            .select(col("query_id"), col("cosine").cast("decimal(10,6)").as("c5")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nn = fifth.agg(count(lit(1)).as("_n"))
        val ranked = graft.ops.RankOps.withGlobalRank(fifth,
            Seq(col("c5"), col("query_id")), "_rn")
          .crossJoin(broadcast(nn))
        ranked.join(broadcast(s.range(1, 10)
            .select(col("id").cast("int").as("decile"))),
            col("_rn") === expr("(decile * _n + 9) div 10"))
          .select(col("decile"), col("c5").cast("double").as("knn5_cosine"))
          .orderBy("decile")
      },
      Some("""WITH q AS (
             |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
             |  FROM embeddings
             |  WHERE CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15))
             |          AS BIGINT) % 16 = 0),
             |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |      FROM embeddings),
             |scored AS (
             |  SELECT q.query_id, e.vec_id,
             |         round(list_cosine_similarity(e.v, q.qv), 6) AS cosine
             |  FROM e, q WHERE e.vec_id <> q.query_id),
             |r5 AS (
             |  SELECT query_id,
             |    CAST(cosine AS DECIMAL(10,6)) AS c5,
             |    row_number() OVER (PARTITION BY query_id
             |      ORDER BY cosine DESC, vec_id) AS rk
             |  FROM scored),
             |f AS (SELECT query_id, c5 FROM r5 WHERE rk = 5),
             |rk2 AS (
             |  SELECT query_id, c5,
             |    row_number() OVER (ORDER BY c5, query_id) AS rn,
             |    count(*) OVER () AS n
             |  FROM f),
             |d AS (SELECT unnest([1,2,3,4,5,6,7,8,9]) AS decile)
             |SELECT d.decile, CAST(rk2.c5 AS DOUBLE) AS knn5_cosine
             |FROM rk2 JOIN d ON rk2.rn = (d.decile * rk2.n + 9) // 10
             |ORDER BY decile""".stripMargin)),

QueryDef("s17_norm_profile",
      // embedding L2-norm deciles: the vector-QA table read before any
      // cosine/dot index is trusted (a fat norm tail means the corpus
      // mixes normalized and raw vectors — dot-product shortcuts and
      // PQ codebooks both break). Norms are 6dp VecDot+sqrt values
      // (in-order fold mirrored by the oracle's list fold), deciles
      // exact order statistics; ties by vec_id.
      (s, dir) => {
        // pinned: the count and the distributed ranking's three input
        // evaluations read the norm frame (the qq1 shape — no
        // single-partition window)
        val n = graft.Caches.trackedPersist(t(s, dir, "embeddings")
            .select(col("vec_id"),
              round(sqrt(S.dot(col("embedding").cast("array<double>"),
                col("embedding").cast("array<double>"))), 6)
                .cast("decimal(12,6)").as("nm")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nn = n.agg(count(lit(1)).as("_n"))
        val ranked = graft.ops.RankOps.withGlobalRank(n,
            Seq(col("nm"), col("vec_id")), "_rn")
          .crossJoin(broadcast(nn))
        ranked.join(broadcast(s.range(1, 10)
            .select(col("id").cast("int").as("decile"))),
            col("_rn") === expr("(decile * _n + 9) div 10"))
          .select(col("decile"), col("nm").cast("double").as("l2_norm"))
          .orderBy("decile")
      },
      Some("""WITH n AS (
             |  SELECT vec_id,
             |    CAST(round(sqrt(list_aggregate(list_transform(
             |      CAST(embedding AS DOUBLE[]), x -> x * x), 'sum')), 6)
             |      AS DECIMAL(12,6)) AS nm
             |  FROM embeddings),
             |rk AS (
             |  SELECT vec_id, nm,
             |    row_number() OVER (ORDER BY nm, vec_id) AS rn,
             |    count(*) OVER () AS cnt
             |  FROM n),
             |d AS (SELECT unnest([1,2,3,4,5,6,7,8,9]) AS decile)
             |SELECT d.decile, CAST(rk.nm AS DOUBLE) AS l2_norm
             |FROM rk JOIN d ON rk.rn = (d.decile * rk.cnt + 9) // 10
             |ORDER BY decile""".stripMargin)),

    QueryDef("s18_binary_sketch_knn",
      // exact KNN over 1-bit SIGN sketches ([[graft.functions
      // .SimilarityFunctions.signSketch]] → [[SimilarityFunctions
      // .hammingTopK]]): the 256×-compression ANN tier below s4's
      // int8 — matching-bit count (dim − Hamming) is a monotone
      // angular-similarity estimate (Charikar SimHash), searched with
      // xor + bit_count inside whole-stage codegen. ALL-INTEGER
      // end-to-end (bit packing in 32-bit words so no engine touches
      // signed-overflow territory; ranking on exact integer matching
      // counts, ties → lower id) — zero FP anywhere, the strongest
      // cross-engine contract in the ANN family.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        S.hammingTopK(emb, q, k = 5, dim = 64).orderBy("query_id", "rank")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |sk AS (
             |  SELECT vec_id,
             |    CAST(SUM(CASE WHEN t.d < 32 AND v[t.d + 1] > 0
             |      THEN (1::BIGINT << t.d) ELSE 0 END) AS BIGINT) AS w0,
             |    CAST(SUM(CASE WHEN t.d >= 32 AND v[t.d + 1] > 0
             |      THEN (1::BIGINT << (t.d - 32)) ELSE 0 END) AS BIGINT) AS w1
             |  FROM e, range(0, 64) t(d) GROUP BY vec_id),
             |q AS (SELECT vec_id AS query_id, w0 AS q0, w1 AS q1
             |      FROM sk WHERE vec_id < 8),
             |scored AS (
             |  SELECT q.query_id, sk.vec_id,
             |    CAST(64 - bit_count(xor(sk.w0, q.q0))
             |            - bit_count(xor(sk.w1, q.q1)) AS INTEGER) AS matching_bits
             |  FROM sk, q WHERE sk.vec_id <> q.query_id),
             |rk AS (
             |  SELECT query_id, vec_id, matching_bits,
             |    CAST(row_number() OVER (PARTITION BY query_id
             |      ORDER BY matching_bits DESC, vec_id) AS INTEGER) AS "rank"
             |  FROM scored)
             |SELECT query_id, vec_id, matching_bits, "rank"
             |FROM rk WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin)),

    QueryDef("s19_hamming_rerank",
      // the binary tier's full serving pipeline (the s9/s12 re-rank
      // pattern on s18's sketches): Hamming shortlist of 50 on the
      // 1-bit sign sketches — integer xor+bit_count, the only stage
      // that touches every corpus row — then exact 6dp-cosine re-rank
      // of the shortlist to top-5. At 100 TB the shortlist stage scans
      // dim/8 bytes per vector and only 50×|queries| raw vectors ever
      // load for the re-rank. Shortlist is integer-exact; the re-rank
      // window runs over ≤ 50 rows per query (bounded).
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        val short = S.hammingTopK(emb, q, k = 50, dim = 64)
          .select(col("query_id"), col("vec_id"))
        val wQ = Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("vec_id"))
        short
          .join(emb.select(col("vec_id"),
            col("embedding").cast("array<double>").as("_v")), "vec_id")
          .join(broadcast(q.select(col("query_id"),
            col("query_vec").cast("array<double>").as("_qv"))), "query_id")
          .withColumn("cosine", round(S.cosine(col("_v"), col("_qv")), 6))
          .withColumn("rank", row_number().over(wQ))
          .filter(col("rank") <= 5)
          .select(col("query_id"), col("vec_id"), col("cosine"), col("rank"))
          .orderBy("query_id", "rank")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |sk AS (
             |  SELECT vec_id,
             |    CAST(SUM(CASE WHEN t.d < 32 AND v[t.d + 1] > 0
             |      THEN (1::BIGINT << t.d) ELSE 0 END) AS BIGINT) AS w0,
             |    CAST(SUM(CASE WHEN t.d >= 32 AND v[t.d + 1] > 0
             |      THEN (1::BIGINT << (t.d - 32)) ELSE 0 END) AS BIGINT) AS w1
             |  FROM e, range(0, 64) t(d) GROUP BY vec_id),
             |q AS (SELECT vec_id AS query_id, w0 AS q0, w1 AS q1
             |      FROM sk WHERE vec_id < 8),
             |shortl AS (
             |  SELECT query_id, vec_id FROM (
             |    SELECT q.query_id, sk.vec_id,
             |      row_number() OVER (PARTITION BY q.query_id
             |        ORDER BY 64 - bit_count(xor(sk.w0, q.q0))
             |                   - bit_count(xor(sk.w1, q.q1)) DESC,
             |                 sk.vec_id) AS rn
             |    FROM sk, q WHERE sk.vec_id <> q.query_id) WHERE rn <= 50),
             |scored AS (
             |  SELECT s.query_id, s.vec_id,
             |    round(list_cosine_similarity(ev.v, eq.v), 6) AS cosine
             |  FROM shortl s
             |  JOIN e ev ON s.vec_id = ev.vec_id
             |  JOIN e eq ON s.query_id = eq.vec_id),
             |rk AS (
             |  SELECT query_id, vec_id, cosine,
             |    CAST(row_number() OVER (PARTITION BY query_id
             |      ORDER BY cosine DESC, vec_id) AS INTEGER) AS "rank"
             |  FROM scored)
             |SELECT query_id, vec_id, cosine, "rank"
             |FROM rk WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin)),

    QueryDef("s23_jl_shortlist",
      // Johnson–Lindenstrauss compressed serving
      // ([[graft.functions.SimilarityFunctions.jlTopKRerank]];
      // Achlioptas JCSS 2003's ±1 database-friendly projection):
      // project 64→16 dims with the hash-derived sign matrix (exact
      // DECIMAL sums — the s3b convention — so the projected
      // coordinates are bit-identical cross-engine), shortlist top-20
      // per query by projected cosine through the bounded-heap kernel,
      // re-rank the shortlist by full-dimension cosine, keep top-10.
      // The classic compress-shortlist-rerank tier: at 100 TB the
      // projection is a scan-local expression and every shortlist
      // distance costs 4× less than full-dimension. The oracle replays
      // the sign matrix (md5 parity), both ranking stages, and the
      // 6dp/lower-id tie contract end-to-end.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        S.jlTopKRerank(emb, q, projDim = 16, shortlist = 20, k = 10)
          .orderBy("query_id", "rank")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |sgn AS MATERIALIZED (
             |  SELECT k, j,
             |    CASE WHEN strpos('01234567', substring(md5('jl#' || k || '#' || j), 1, 1)) > 0
             |         THEN 1 ELSE -1 END AS s
             |  FROM range(0, 16) t1(k), range(0, 64) t2(j)),
             |p AS MATERIALIZED (
             |  SELECT vec_id, list(pk ORDER BY k) AS pv FROM (
             |    SELECT e.vec_id, g.k,
             |      CAST(SUM(CASE WHEN g.s > 0 THEN CAST(e.v[g.j + 1] AS DECIMAL(20,10))
             |               ELSE -CAST(e.v[g.j + 1] AS DECIMAL(20,10)) END) AS DOUBLE) AS pk
             |    FROM e, sgn g GROUP BY e.vec_id, g.k)
             |  GROUP BY vec_id),
             |sl AS MATERIALIZED (
             |  SELECT query_id, vec_id FROM (
             |    SELECT q.vec_id AS query_id, c.vec_id,
             |      row_number() OVER (PARTITION BY q.vec_id
             |        ORDER BY round(list_cosine_similarity(c.pv, q.pv), 6) DESC, c.vec_id) AS rn
             |    FROM p q JOIN p c ON c.vec_id <> q.vec_id
             |    WHERE q.vec_id < 8) WHERE rn <= 20),
             |r AS (
             |  SELECT sl.query_id, sl.vec_id,
             |    round(list_cosine_similarity(c.v, q.v), 6) AS cosine,
             |    CAST(row_number() OVER (PARTITION BY sl.query_id
             |      ORDER BY round(list_cosine_similarity(c.v, q.v), 6) DESC, sl.vec_id) AS INTEGER) AS "rank"
             |  FROM sl JOIN e c ON sl.vec_id = c.vec_id JOIN e q ON sl.query_id = q.vec_id)
             |SELECT query_id, vec_id, cosine, "rank" FROM r WHERE "rank" <= 10
             |ORDER BY query_id, "rank"""".stripMargin)),

    QueryDef("s22_probe_sweep",
      // IVF tuning curve: recall@5 vs the exact s1 answer for
      // nProbe ∈ {1,2,3,4} in ONE query — the table that picks the
      // probe budget (s7 measures one config; the sweep shows the
      // recall/cost knee). Assignment + probe ranks compute once;
      // the per-config top-5 rides the bounded-heap topKPerQuery with
      // a composite (query·10 + nProbe) key — no per-config rescan,
      // no data-sized window. Recalls are exact rationals, 6dp.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val cents = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").as("_cid"),
            col("embedding").cast("array<double>").as("_cv"))
        val q = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        val cells = emb.crossJoin(broadcast(cents))
          .withColumn("_cos",
            S.cosine(col("embedding").cast("array<double>"), col("_cv")))
          .groupBy("vec_id")
          .agg(min(struct((-col("_cos")).as("n"), col("_cid").as("c")))
            .getField("c").as("cell"))
        // pinned: the 4 probe configs all scan the assigned corpus once
        val asg = graft.Caches.trackedPersist(
          emb.select(col("vec_id"), col("embedding")).join(cells, "vec_id"),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val probes = q.crossJoin(broadcast(cents))
          .withColumn("_c", S.cosine(col("query_vec").cast("array<double>"),
            col("_cv")))
          .withColumn("rp", row_number().over(Window.partitionBy("query_id")
            .orderBy(col("_c").desc, col("_cid"))))
          .select(col("query_id"), col("query_vec"),
            col("_cid").as("cell"), col("rp"))
        val nps = s.range(1, 5).select(col("id").cast("int").as("n_probe"))
        val cand = asg.join(broadcast(probes), "cell")
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("_cos", round(S.cosine(
            col("embedding").cast("array<double>"),
            col("query_vec").cast("array<double>")), 6))
          .crossJoin(broadcast(nps))
          .filter(col("rp") <= col("n_probe"))
          .select((col("query_id") * 10 + col("n_probe")).cast("long").as("_q"),
            col("vec_id").cast("long").as("_id"), col("_cos").as("_c"))
        import s.implicits._
        val approx = S.topKPerQuery(cand.as[(Long, Long, Double)], 5)
          .select(expr("_q div 10").as("query_id"),
            (col("_q") % 10).cast("int").as("n_probe"), col("_id").as("vec_id"))
        val exact = graft.Caches.trackedPersist(
          S.bruteForceTopK(emb, q, 5).select(col("query_id"), col("vec_id")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val hits = approx.join(exact, Seq("query_id", "vec_id"))
          .groupBy("query_id", "n_probe").agg(count(lit(1)).as("_h"))
        val grid = q.select(col("query_id")).crossJoin(broadcast(nps))
        grid.join(hits, Seq("query_id", "n_probe"), "left")
          .withColumn("_h", coalesce(col("_h"), lit(0L)))
          .groupBy("n_probe")
          .agg(count(lit(1)).as("n_queries"),
            round(sum(col("_h")).cast("double") /
              (count(lit(1)) * 5).cast("double"), 6).as("mean_recall"),
            round(min(col("_h")).cast("double") / 5.0, 6).as("min_recall"))
          .orderBy("n_probe")
      },
      Some("""WITH c AS (
             |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
             |  FROM embeddings WHERE vec_id < 4),
             |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
             |cells AS (
             |  SELECT vec_id, cid AS cell FROM (
             |    SELECT e.vec_id, c.cid,
             |      row_number() OVER (PARTITION BY e.vec_id
             |        ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
             |    FROM e, c) WHERE rn = 1),
             |probes AS (
             |  SELECT query_id, qv, cid AS cell, rp FROM (
             |    SELECT q.query_id, q.qv, c.cid,
             |      row_number() OVER (PARTITION BY q.query_id
             |        ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.cid) AS rp
             |    FROM q, c)),
             |nps AS (SELECT unnest([1, 2, 3, 4]) AS n_probe),
             |appr AS (
             |  SELECT query_id, n_probe, vec_id FROM (
             |    SELECT p.query_id, np.n_probe, a.vec_id,
             |      row_number() OVER (PARTITION BY p.query_id, np.n_probe
             |        ORDER BY round(list_cosine_similarity(ev.v, p.qv), 6) DESC,
             |                 a.vec_id) AS rk
             |    FROM cells a JOIN e ev ON a.vec_id = ev.vec_id
             |    JOIN probes p ON a.cell = p.cell
             |    CROSS JOIN nps np
             |    WHERE p.rp <= np.n_probe AND a.vec_id <> p.query_id)
             |  WHERE rk <= 5),
             |exact AS (
             |  SELECT query_id, vec_id FROM (
             |    SELECT q.query_id, e.vec_id,
             |      row_number() OVER (PARTITION BY q.query_id
             |        ORDER BY round(list_cosine_similarity(e.v, q.qv), 6) DESC,
             |                 e.vec_id) AS rk
             |    FROM e, q WHERE e.vec_id <> q.query_id) WHERE rk <= 5),
             |hits AS (
             |  SELECT a.query_id, a.n_probe, count(*) AS h
             |  FROM appr a JOIN exact x
             |    ON a.query_id = x.query_id AND a.vec_id = x.vec_id
             |  GROUP BY 1, 2),
             |grid AS (SELECT q.query_id, np.n_probe FROM q CROSS JOIN nps np)
             |SELECT g.n_probe, count(*) AS n_queries,
             |  round(CAST(sum(COALESCE(h.h, 0)) AS DOUBLE)
             |    / CAST(count(*) * 5 AS DOUBLE), 6) AS mean_recall,
             |  round(CAST(min(COALESCE(h.h, 0)) AS DOUBLE) / 5.0, 6)
             |    AS min_recall
             |FROM grid g LEFT JOIN hits h
             |  ON g.query_id = h.query_id AND g.n_probe = h.n_probe
             |GROUP BY 1 ORDER BY g.n_probe""".stripMargin)),

    QueryDef("s20_mutual_knn",
      // reciprocal best matches: pairs where each vector is the
      // OTHER's nearest neighbor — the high-precision alignment/
      // linkage primitive (mutual-NN is the standard seed set for
      // embedding-space alignment and aggressive semantic dedup:
      // one-directional top-1 chains through hubs, mutual top-1
      // doesn't). One bounded-heap top-1 pass, then a self-join of the
      // |corpus|-row best-match table on the reversed pair; 6dp
      // cosines make the argmax engine-stable (the s1 contract).
      // This is the exact all-queries baseline (the s16/s1 class); at
      // crawl scale the same reciprocal join runs over the
      // LSH-bucketed (s2) or IVF-probed (s3) candidate top-1s instead
      // of the brute-force ones — the reciprocal filter is index-
      // agnostic.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = emb.select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
        // pinned: both sides of the reciprocal join read the top-1 table
        val top1 = graft.Caches.trackedPersist(
          S.bruteForceTopK(emb, q, 1)
            .select(col("query_id").as("a"), col("vec_id").as("b"),
              col("cosine")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        top1.as("x").join(top1.as("y"),
            col("x.a") === col("y.b") && col("x.b") === col("y.a") &&
              col("x.a") < col("x.b"))
          .select(col("x.a").as("id_a"), col("x.b").as("id_b"),
            col("x.cosine"))
          .orderBy("id_a")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |scored AS (
             |  SELECT a.vec_id AS ida, b.vec_id AS idb,
             |    round(list_cosine_similarity(a.v, b.v), 6) AS c
             |  FROM e a, e b WHERE a.vec_id <> b.vec_id),
             |t1 AS (
             |  SELECT ida AS a, idb AS b, c FROM (
             |    SELECT ida, idb, c,
             |      row_number() OVER (PARTITION BY ida
             |        ORDER BY c DESC, idb) AS rn
             |    FROM scored) WHERE rn = 1)
             |SELECT x.a AS id_a, x.b AS id_b, x.c AS cosine
             |FROM t1 x JOIN t1 y ON x.a = y.b AND x.b = y.a AND x.a < x.b
             |ORDER BY id_a""".stripMargin)),

    QueryDef("s20b_mutual_knn_indexed",
      // the INDEX-ASSISTED twin of s20's mutual-KNN (s20 stays as the
      // exact O(n²)-cosine audit baseline): 1-bit sign-sketch Hamming
      // shortlist of 50 per query ([[graft.functions
      // .SimilarityFunctions.signSketch]] → [[SimilarityFunctions
      // .hammingTopK]] — integer xor+bit_count, the only stage that
      // touches every corpus row, at dim/8 bytes per vector), exact
      // 6dp-cosine re-rank of each shortlist to the query's best
      // match (bounded ≤50-row windows, the s19 serving pattern),
      // then the reciprocal join on the |corpus|-row best-match
      // table — s20's filter, index-agnostic as documented there.
      // Every stage is deterministic (integer Hamming, ties → lower
      // id; 6dp cosines), so the FULL pipeline replays in DuckDB:
      // the oracle is the algorithm, not the exact-s20 answer — a
      // shortlist miss is a property of the method, auditable by
      // diffing against s20.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = emb.select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
        val short = S.hammingTopK(emb, q, k = 50, dim = 64)
          .select(col("query_id"), col("vec_id"))
        val wQ = Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("vec_id"))
        // pinned: both sides of the reciprocal join read the re-ranked
        // best-match table (the s20 shape)
        val best = graft.Caches.trackedPersist(
          short
            .join(emb.select(col("vec_id"),
              col("embedding").cast("array<double>").as("_v")), "vec_id")
            .join(emb.select(col("vec_id").as("query_id"),
              col("embedding").cast("array<double>").as("_qv")), "query_id")
            .withColumn("cosine", round(S.cosine(col("_v"), col("_qv")), 6))
            .withColumn("_rn", row_number().over(wQ))
            .filter(col("_rn") === 1)
            .select(col("query_id").as("a"), col("vec_id").as("b"),
              col("cosine")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        best.as("x").join(best.as("y"),
            col("x.a") === col("y.b") && col("x.b") === col("y.a") &&
              col("x.a") < col("x.b"))
          .select(col("x.a").as("id_a"), col("x.b").as("id_b"),
            col("x.cosine"))
          .orderBy("id_a")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |sk AS (
             |  SELECT vec_id,
             |    CAST(SUM(CASE WHEN t.d < 32 AND v[t.d + 1] > 0
             |      THEN (1::BIGINT << t.d) ELSE 0 END) AS BIGINT) AS w0,
             |    CAST(SUM(CASE WHEN t.d >= 32 AND v[t.d + 1] > 0
             |      THEN (1::BIGINT << (t.d - 32)) ELSE 0 END) AS BIGINT) AS w1
             |  FROM e, range(0, 64) t(d) GROUP BY vec_id),
             |shortl AS (
             |  SELECT query_id, vec_id FROM (
             |    SELECT q.vec_id AS query_id, sk.vec_id,
             |      row_number() OVER (PARTITION BY q.vec_id
             |        ORDER BY 64 - bit_count(xor(sk.w0, q.w0))
             |                   - bit_count(xor(sk.w1, q.w1)) DESC,
             |                 sk.vec_id) AS rn
             |    FROM sk, sk q WHERE sk.vec_id <> q.vec_id) WHERE rn <= 50),
             |best AS (
             |  SELECT query_id AS a, vec_id AS b, c AS cosine FROM (
             |    SELECT s.query_id, s.vec_id,
             |      round(list_cosine_similarity(ev.v, eq.v), 6) AS c,
             |      row_number() OVER (PARTITION BY s.query_id
             |        ORDER BY round(list_cosine_similarity(ev.v, eq.v), 6) DESC,
             |                 s.vec_id) AS rn
             |    FROM shortl s
             |    JOIN e ev ON s.vec_id = ev.vec_id
             |    JOIN e eq ON s.query_id = eq.vec_id) WHERE rn = 1)
             |SELECT x.a AS id_a, x.b AS id_b, x.cosine AS cosine
             |FROM best x JOIN best y ON x.a = y.b AND x.b = y.a AND x.a < x.b
             |ORDER BY id_a""".stripMargin)),

    QueryDef("s20c_mutual_knn_blocked",
      // the PRODUCTION twin of s20b: same mutual-KNN pipeline, but the
      // shortlist comes from the LSH-BLOCKED sketch kernel
      // ([[graft.functions.SimilarityFunctions.hammingTopKBlocked]] —
      // 8 bands × 8 bits over the 64-bit sign sketch, candidates =
      // DISTINCT band-collision pairs via equi-join, exact
      // xor+bit_count Hamming WITHIN candidates only). s20b's broadcast
      // kernel enumerates every (query, corpus) pair and collects the
      // corpus-sized query sketch table to the driver when the corpus
      // is the query side — this form collects NOTHING and shuffles
      // only 8 band rows per vector, so mutual-KNN seeding survives a
      // 10⁹-vector corpus where s20b is a driver OOM. Every stage is
      // deterministic (bit-arithmetic band keys, integer Hamming,
      // ties → lower id; 6dp cosines), so the full pipeline — banding
      // included — replays in DuckDB: the oracle is the algorithm, the
      // s20b convention; a banding miss is a property of the method,
      // auditable by diffing against s20/s20b. Band width is PINNED at
      // 8 bits — the width [[SimilarityFunctions.sizedBandBits]]
      // selects at every driver SF (≤ 2^14 vectors) and the only one
      // this oracle replays; pinning (r15, per ADVICE) makes Spark and
      // oracle agree BY CONSTRUCTION at any future SF instead of
      // resting on an implicit row-count assumption that would fail
      // the hash with no pointer to the cause. The auto-sizing rule
      // itself stays spec-pinned (SimilarityFunctionsSpec) and probed
      // at sf1/sf10 where it selects 16-bit; s20d oracle-verifies that
      // production width end-to-end.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = emb.select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
        val short = S.hammingTopKBlocked(emb, q, k = 50, dim = 64,
            bandBits = 8)
          .select(col("query_id"), col("vec_id"))
        val wQ = Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("vec_id"))
        // pinned: both sides of the reciprocal join read the re-ranked
        // best-match table (the s20 shape)
        val best = graft.Caches.trackedPersist(
          short
            .join(emb.select(col("vec_id"),
              col("embedding").cast("array<double>").as("_v")), "vec_id")
            .join(emb.select(col("vec_id").as("query_id"),
              col("embedding").cast("array<double>").as("_qv")), "query_id")
            .withColumn("cosine", round(S.cosine(col("_v"), col("_qv")), 6))
            .withColumn("_rn", row_number().over(wQ))
            .filter(col("_rn") === 1)
            .select(col("query_id").as("a"), col("vec_id").as("b"),
              col("cosine")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        best.as("x").join(best.as("y"),
            col("x.a") === col("y.b") && col("x.b") === col("y.a") &&
              col("x.a") < col("x.b"))
          .select(col("x.a").as("id_a"), col("x.b").as("id_b"),
            col("x.cosine"))
          .orderBy("id_a")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |sk AS MATERIALIZED (
             |  SELECT vec_id,
             |    CAST(SUM(CASE WHEN t.d < 32 AND v[t.d + 1] > 0
             |      THEN (1::BIGINT << t.d) ELSE 0 END) AS BIGINT) AS w0,
             |    CAST(SUM(CASE WHEN t.d >= 32 AND v[t.d + 1] > 0
             |      THEN (1::BIGINT << (t.d - 32)) ELSE 0 END) AS BIGINT) AS w1
             |  FROM e, range(0, 64) t(d) GROUP BY vec_id),
             |bnd AS MATERIALIZED (
             |  SELECT vec_id, t.band,
             |    CASE WHEN t.band < 4 THEN (w0 >> (t.band * 8)) & 255
             |         ELSE (w1 >> ((t.band - 4) * 8)) & 255 END AS key
             |  FROM sk, range(0, 8) t(band)),
             |cand AS (
             |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id
             |  FROM bnd q JOIN bnd c ON q.band = c.band AND q.key = c.key
             |  WHERE q.vec_id <> c.vec_id),
             |shortl AS (
             |  SELECT query_id, vec_id FROM (
             |    SELECT cd.query_id, cd.vec_id,
             |      row_number() OVER (PARTITION BY cd.query_id
             |        ORDER BY 64 - bit_count(xor(c.w0, q.w0))
             |                   - bit_count(xor(c.w1, q.w1)) DESC,
             |                 cd.vec_id) AS rn
             |    FROM cand cd JOIN sk c ON c.vec_id = cd.vec_id
             |                 JOIN sk q ON q.vec_id = cd.query_id)
             |  WHERE rn <= 50),
             |best AS (
             |  SELECT query_id AS a, vec_id AS b, c AS cosine FROM (
             |    SELECT s.query_id, s.vec_id,
             |      round(list_cosine_similarity(ev.v, eq.v), 6) AS c,
             |      row_number() OVER (PARTITION BY s.query_id
             |        ORDER BY round(list_cosine_similarity(ev.v, eq.v), 6) DESC,
             |                 s.vec_id) AS rn
             |    FROM shortl s
             |    JOIN e ev ON s.vec_id = ev.vec_id
             |    JOIN e eq ON s.query_id = eq.vec_id) WHERE rn = 1)
             |SELECT x.a AS id_a, x.b AS id_b, x.cosine AS cosine
             |FROM best x JOIN best y ON x.a = y.b AND x.b = y.a AND x.a < x.b
             |ORDER BY id_a""".stripMargin)),

    QueryDef("s20d_mutual_knn_blocked16",
      // the 16-BIT-BAND twin of s20c (r15, closing the r14 verdict's
      // missing-item 2): identical mutual-KNN pipeline through
      // [[SimilarityFunctions.hammingTopKBlocked]], but at the band
      // width production ACTUALLY runs past 2^14 vectors —
      // [[SimilarityFunctions.sizedBandBits]] selects 16 bits for
      // n ∈ (2^14, 2^22], i.e. at the sf1/sf10 probe scales and any
      // real corpus — which until now was pinned only by the recall
      // spec and probe wall-clocks, never hash-verified cross-engine.
      // The oracle replays 4 bands × 16 bits (2 per sketch word)
      // end-to-end; candidates are sparser (only pairs agreeing on a
      // full 16-bit run collide — at driver SF mostly planted twins
      // and the band-collision tail), so the mutual set differs from
      // s20c BY DESIGN: the diff IS the recall cost of the wider
      // band, now auditable as data.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = emb.select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
        val short = S.hammingTopKBlocked(emb, q, k = 50, dim = 64,
            bandBits = 16)
          .select(col("query_id"), col("vec_id"))
        val wQ = Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("vec_id"))
        val best = graft.Caches.trackedPersist(
          short
            .join(emb.select(col("vec_id"),
              col("embedding").cast("array<double>").as("_v")), "vec_id")
            .join(emb.select(col("vec_id").as("query_id"),
              col("embedding").cast("array<double>").as("_qv")), "query_id")
            .withColumn("cosine", round(S.cosine(col("_v"), col("_qv")), 6))
            .withColumn("_rn", row_number().over(wQ))
            .filter(col("_rn") === 1)
            .select(col("query_id").as("a"), col("vec_id").as("b"),
              col("cosine")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        best.as("x").join(best.as("y"),
            col("x.a") === col("y.b") && col("x.b") === col("y.a") &&
              col("x.a") < col("x.b"))
          .select(col("x.a").as("id_a"), col("x.b").as("id_b"),
            col("x.cosine"))
          .orderBy("id_a")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |sk AS MATERIALIZED (
             |  SELECT vec_id,
             |    CAST(SUM(CASE WHEN t.d < 32 AND v[t.d + 1] > 0
             |      THEN (1::BIGINT << t.d) ELSE 0 END) AS BIGINT) AS w0,
             |    CAST(SUM(CASE WHEN t.d >= 32 AND v[t.d + 1] > 0
             |      THEN (1::BIGINT << (t.d - 32)) ELSE 0 END) AS BIGINT) AS w1
             |  FROM e, range(0, 64) t(d) GROUP BY vec_id),
             |bnd AS MATERIALIZED (
             |  SELECT vec_id, t.band,
             |    CASE WHEN t.band < 2 THEN (w0 >> (t.band * 16)) & 65535
             |         ELSE (w1 >> ((t.band - 2) * 16)) & 65535 END AS key
             |  FROM sk, range(0, 4) t(band)),
             |cand AS (
             |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id
             |  FROM bnd q JOIN bnd c ON q.band = c.band AND q.key = c.key
             |  WHERE q.vec_id <> c.vec_id),
             |shortl AS (
             |  SELECT query_id, vec_id FROM (
             |    SELECT cd.query_id, cd.vec_id,
             |      row_number() OVER (PARTITION BY cd.query_id
             |        ORDER BY 64 - bit_count(xor(c.w0, q.w0))
             |                   - bit_count(xor(c.w1, q.w1)) DESC,
             |                 cd.vec_id) AS rn
             |    FROM cand cd JOIN sk c ON c.vec_id = cd.vec_id
             |                 JOIN sk q ON q.vec_id = cd.query_id)
             |  WHERE rn <= 50),
             |best AS (
             |  SELECT query_id AS a, vec_id AS b, c AS cosine FROM (
             |    SELECT s.query_id, s.vec_id,
             |      round(list_cosine_similarity(ev.v, eq.v), 6) AS c,
             |      row_number() OVER (PARTITION BY s.query_id
             |        ORDER BY round(list_cosine_similarity(ev.v, eq.v), 6) DESC,
             |                 s.vec_id) AS rn
             |    FROM shortl s
             |    JOIN e ev ON s.vec_id = ev.vec_id
             |    JOIN e eq ON s.query_id = eq.vec_id) WHERE rn = 1)
             |SELECT x.a AS id_a, x.b AS id_b, x.cosine AS cosine
             |FROM best x JOIN best y ON x.a = y.b AND x.b = y.a AND x.a < x.b
             |ORDER BY id_a""".stripMargin)),

    QueryDef("s21_ivf_balance",
      // IVF cell-balance audit over s3's fixed-centroid assignment:
      // per-cell population, share, and the imbalance factor
      // max/mean — the serving-health table read before trusting an
      // IVF index's probe cost model (a hub cell serves most probes;
      // at 100 TB a 10× imbalance IS the p99). Assignment is one
      // broadcast argmax (raw cosine, lower-cid ties — the s3
      // semantics); everything after runs on the cell census.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val cents = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").as("_cid"),
            col("embedding").cast("array<double>").as("_cv"))
        val asg = emb.crossJoin(broadcast(cents))
          .withColumn("_cos",
            S.cosine(col("embedding").cast("array<double>"), col("_cv")))
          .groupBy("vec_id")
          .agg(min(struct((-col("_cos")).as("n"), col("_cid").as("c")))
            .getField("c").as("cell"))
        val cells = asg.groupBy("cell").agg(count(lit(1)).as("n_vectors"))
        val tot = cells.agg(sum(col("n_vectors")).as("_n"),
          count(lit(1)).as("_nc"), max(col("n_vectors")).as("_mx"))
        cells.crossJoin(broadcast(tot))
          .select(col("cell"), col("n_vectors"),
            round(col("n_vectors").cast("double") / col("_n").cast("double"), 6)
              .as("share"),
            round((col("_mx") * col("_nc")).cast("double") /
              col("_n").cast("double"), 6).as("imbalance"))
          .orderBy("cell")
      },
      Some("""WITH c AS (
             |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
             |  FROM embeddings WHERE vec_id < 4),
             |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |asg AS (
             |  SELECT vec_id, cid AS cell FROM (
             |    SELECT e.vec_id, c.cid,
             |      row_number() OVER (PARTITION BY e.vec_id
             |        ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
             |    FROM e, c) WHERE rn = 1),
             |cells AS (SELECT cell, count(*) AS n_vectors FROM asg GROUP BY 1),
             |tot AS (SELECT CAST(sum(n_vectors) AS BIGINT) AS n,
             |               count(*) AS nc,
             |               CAST(max(n_vectors) AS BIGINT) AS mx FROM cells)
             |SELECT cells.cell, cells.n_vectors,
             |  round(CAST(cells.n_vectors AS DOUBLE) / CAST(tot.n AS DOUBLE), 6)
             |    AS share,
             |  round(CAST(tot.mx * tot.nc AS DOUBLE) / CAST(tot.n AS DOUBLE), 6)
             |    AS imbalance
             |FROM cells CROSS JOIN tot ORDER BY cell""".stripMargin)),

    QueryDef("er2_fellegi_sunter",
      // Fellegi–Sunter record-linkage weights (JASA 1969) over er1's
      // planted title universe with KNOWN labels (ids sharing `div 2`
      // are true matches — the typo-variant pairs): per comparison
      // feature (exact equality, equal length, Jaro-Winkler ≥ 0.9),
      // the conditional agreement rates m = P(agree|match) and
      // u = P(agree|non-match), Laplace-smoothed (+1/+2 — an unseen
      // agreement pattern must not emit ±∞), and the log₂ match/
      // non-match weights the linkage score sums. All counts exact
      // over the 1,770 labeled pairs (bounded: the planted universe);
      // m/u round 6dp BEFORE the log (identical inputs cross-engine,
      // the cls1 libm convention), weights round 6dp.
      (s, dir) => {
        val titles = docs(s, dir).filter(col("doc_id") < 60)
          .select(col("doc_id"),
            when(col("doc_id") % 4 === 0,
              concat(lit("stochastic gradient descent overview "),
                expr("doc_id div 4")))
            .when(col("doc_id") % 4 === 1,
              concat(lit("stochastic gradient descent overviev "),
                expr("doc_id div 4")))
            .when(col("doc_id") % 4 === 2,
              concat(lit("complete treatise on offshore sailing "),
                expr("doc_id div 4")))
            .otherwise(
              concat(lit("cmplete treatise on offshore sailng "),
                expr("doc_id div 4")))
            .as("title"))
        val pairs = titles.as("x").join(titles.as("y"),
            col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("ida"), col("y.doc_id").as("idb"),
            col("x.title").as("ta"), col("y.title").as("tb"))
          .withColumn("label", expr("ida div 2 = idb div 2"))
          .withColumn("f_exact", col("ta") === col("tb"))
          .withColumn("f_length", length(col("ta")) === length(col("tb")))
          .withColumn("f_jw",
            round(graft.functions.JaroWinkler(col("ta"), col("tb")), 6) >= 0.9)
        val long = pairs.selectExpr("label",
          "stack(3, 'exact', f_exact, 'jaro_winkler', f_jw, " +
            "'length', f_length) AS (feature, agree)")
        long.groupBy("feature")
          .agg(sum(when(col("label") && col("agree"), 1L).otherwise(0L)).as("_am"),
            sum(when(col("label"), 1L).otherwise(0L)).as("_nm"),
            sum(when(!col("label") && col("agree"), 1L).otherwise(0L)).as("_au"),
            sum(when(!col("label"), 1L).otherwise(0L)).as("_nu"))
          .withColumn("m", round((col("_am") + 1).cast("double") /
            (col("_nm") + 2).cast("double"), 6))
          .withColumn("u", round((col("_au") + 1).cast("double") /
            (col("_nu") + 2).cast("double"), 6))
          .select(col("feature"), col("m"), col("u"),
            round(log2(col("m") / col("u")), 6).as("w_agree"),
            round(log2((lit(1.0) - col("m")) / (lit(1.0) - col("u"))), 6)
              .as("w_disagree"))
          .orderBy("feature")
      },
      Some("""WITH titles AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 4 = 0
             |           THEN 'stochastic gradient descent overview ' || CAST(doc_id // 4 AS VARCHAR)
             |         WHEN doc_id % 4 = 1
             |           THEN 'stochastic gradient descent overviev ' || CAST(doc_id // 4 AS VARCHAR)
             |         WHEN doc_id % 4 = 2
             |           THEN 'complete treatise on offshore sailing ' || CAST(doc_id // 4 AS VARCHAR)
             |         ELSE 'cmplete treatise on offshore sailng ' || CAST(doc_id // 4 AS VARCHAR)
             |    END AS title
             |  FROM documents WHERE doc_id < 60),
             |p AS (
             |  SELECT x.doc_id // 2 = y.doc_id // 2 AS label,
             |    x.title = y.title AS f_exact,
             |    length(x.title) = length(y.title) AS f_length,
             |    round(jaro_winkler_similarity(x.title, y.title), 6) >= 0.9
             |      AS f_jw
             |  FROM titles x JOIN titles y ON x.doc_id < y.doc_id),
             |long AS (
             |  SELECT label, 'exact' AS feature, f_exact AS agree FROM p
             |  UNION ALL
             |  SELECT label, 'jaro_winkler', f_jw FROM p
             |  UNION ALL
             |  SELECT label, 'length', f_length FROM p),
             |a AS (
             |  SELECT feature,
             |    round(CAST(sum(CASE WHEN label AND agree THEN 1 ELSE 0 END) + 1
             |      AS DOUBLE) / CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) + 2
             |      AS DOUBLE), 6) AS m,
             |    round(CAST(sum(CASE WHEN NOT label AND agree THEN 1 ELSE 0 END) + 1
             |      AS DOUBLE) / CAST(sum(CASE WHEN NOT label THEN 1 ELSE 0 END) + 2
             |      AS DOUBLE), 6) AS u
             |  FROM long GROUP BY 1)
             |SELECT feature, m, u,
             |  round(log2(m / u), 6) AS w_agree,
             |  round(log2((1.0 - m) / (1.0 - u)), 6) AS w_disagree
             |FROM a ORDER BY feature""".stripMargin)),

    QueryDef("r9_kneser_ney",
      // interpolated Kneser–Ney bigram scoring ([[graft.functions
      // .RelevanceFunctions.kneserNeyLogProb]]; Kneser & Ney 1995,
      // Chen & Goodman TR-10-98 eq. 4.26) — the smoothing KenLM (and
      // therefore the real CCNet filter) uses, one rung above r3's raw
      // MLE: discounted pair mass interpolated with the continuation
      // ("novel-context") unigram, so rare-but-valid continuations keep
      // probability and context-locked words stop looking probable
      // everywhere. One pinned bigram explode; pair counts pinned and
      // reduced three ways (prefix, continuation, type total — each
      // Zipf-small, broadcast back); per-occurrence P_KN is a
      // fixed-order IEEE chain the oracle replays literally.
      (s, dir) => R.kneserNeyLogProb(docs(s, dir), "doc_id", "text")
        .select(col("doc_id"), round(col("log_prob"), 6).as("log_prob"))
        .orderBy("doc_id"),
      Some("""WITH tk AS (
             |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
             |  FROM documents),
             |bg AS (
             |  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
             |  FROM tk, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
             |  WHERE len(w) >= 2),
             |c2 AS (SELECT w1, w2, count(*) AS n2 FROM bg GROUP BY 1, 2),
             |pre AS (SELECT w1, CAST(sum(n2) AS BIGINT) AS n1,
             |               count(*) AS t1 FROM c2 GROUP BY 1),
             |cont AS (SELECT w2, count(*) AS cc FROM c2 GROUP BY 1),
             |tt AS (SELECT CAST(count(*) AS DOUBLE) AS tot FROM c2),
             |sc AS (
             |  SELECT b.doc_id,
             |    avg(ln(greatest(CAST(n2 AS DOUBLE) - 0.75, 0.0)
             |             / CAST(n1 AS DOUBLE)
             |           + (0.75 * CAST(t1 AS DOUBLE) / CAST(n1 AS DOUBLE))
             |             * (CAST(cc AS DOUBLE) / tot))) AS lp
             |  FROM bg b JOIN c2 USING (w1, w2) JOIN pre USING (w1)
             |            JOIN cont USING (w2), tt
             |  GROUP BY 1)
             |SELECT d.doc_id, round(coalesce(sc.lp, -20.0), 6) AS log_prob
             |FROM documents d LEFT JOIN sc USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    QueryDef("s25_hard_negatives",
      // hard-negative mining for contrastive training ([[graft
      // .functions.SimilarityFunctions.hardNegativeTopK]]; DPR,
      // Karpukhin et al. EMNLP 2020 §3.2): per anchor, the
      // highest-cosine DIFFERENT-label vectors — sign-sketch shortlist
      // of 60 (integer xor+bit_count over the whole corpus), exact
      // re-rank + class filter over the bounded shortlist only, top-5.
      // The oracle replays sketch, shortlist, filter, and both tie
      // contracts end-to-end.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"),
            col("embedding").as("query_vec"), col("label").as("query_label"))
        S.hardNegativeTopK(emb, q, k = 5, shortlist = 60, dim = 64)
          .orderBy("query_id", "rank")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings),
             |sk AS (
             |  SELECT vec_id,
             |    CAST(SUM(CASE WHEN t.d < 32 AND v[t.d + 1] > 0
             |      THEN (1::BIGINT << t.d) ELSE 0 END) AS BIGINT) AS w0,
             |    CAST(SUM(CASE WHEN t.d >= 32 AND v[t.d + 1] > 0
             |      THEN (1::BIGINT << (t.d - 32)) ELSE 0 END) AS BIGINT) AS w1
             |  FROM e, range(0, 64) t(d) GROUP BY vec_id),
             |q AS (SELECT vec_id AS query_id, w0 AS q0, w1 AS q1
             |      FROM sk WHERE vec_id < 8),
             |shortl AS (
             |  SELECT query_id, vec_id FROM (
             |    SELECT q.query_id, sk.vec_id,
             |      row_number() OVER (PARTITION BY q.query_id
             |        ORDER BY 64 - bit_count(xor(sk.w0, q.q0))
             |                   - bit_count(xor(sk.w1, q.q1)) DESC,
             |                 sk.vec_id) AS rn
             |    FROM sk, q WHERE sk.vec_id <> q.query_id) WHERE rn <= 60),
             |scored AS (
             |  SELECT s.query_id, s.vec_id, ev.label,
             |    round(list_cosine_similarity(ev.v, eq.v), 6) AS cosine
             |  FROM shortl s
             |  JOIN e ev ON s.vec_id = ev.vec_id
             |  JOIN e eq ON s.query_id = eq.vec_id
             |  WHERE ev.label <> eq.label),
             |rk AS (
             |  SELECT query_id, vec_id, label, cosine,
             |    CAST(row_number() OVER (PARTITION BY query_id
             |      ORDER BY cosine DESC, vec_id) AS INTEGER) AS "rank"
             |  FROM scored)
             |SELECT query_id, vec_id, label, cosine, "rank"
             |FROM rk WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin)),

    QueryDef("s26_bitext_margin",
      // margin-criterion bitext mining ([[graft.functions
      // .SimilarityFunctions.marginBitextMine]]; Artetxe & Schwenk ACL
      // 2019, the CCMatrix/LASER recipe): cross-side pairs scored by
      // cosine normalized by BOTH endpoints' k-NN neighborhood density,
      // so hub vectors stop clearing a fixed cosine bar. Sandbox sides:
      // even labels = source, odd = target (stand-ins for the two
      // languages' encoders). Both directions ride the sign-sketch
      // kernel + bounded exact re-rank; the oracle replays sketches,
      // both shortlists, both density averages, the margin chain, and
      // the per-source argmax end-to-end.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        S.marginBitextMine(
          emb.filter(col("label") % 2 === 0),
          emb.filter(col("label") % 2 === 1),
          k = 4, cand = 8, shortlist = 16, dim = 64, threshold = 1.0)
          .orderBy("src_id")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings),
             |sk AS MATERIALIZED (
             |  SELECT vec_id,
             |    CAST(SUM(CASE WHEN t.d < 32 AND v[t.d + 1] > 0
             |      THEN (1::BIGINT << t.d) ELSE 0 END) AS BIGINT) AS w0,
             |    CAST(SUM(CASE WHEN t.d >= 32 AND v[t.d + 1] > 0
             |      THEN (1::BIGINT << (t.d - 32)) ELSE 0 END) AS BIGINT) AS w1
             |  FROM e, range(0, 64) t(d) GROUP BY vec_id),
             |ska AS (SELECT s.* FROM sk s JOIN e USING (vec_id)
             |        WHERE e.label % 2 = 0),
             |skb AS (SELECT s.* FROM sk s JOIN e USING (vec_id)
             |        WHERE e.label % 2 = 1),
             |fsl AS (
             |  SELECT query_id, vec_id FROM (
             |    SELECT q.vec_id AS query_id, c.vec_id,
             |      row_number() OVER (PARTITION BY q.vec_id
             |        ORDER BY 64 - bit_count(xor(c.w0, q.w0))
             |                   - bit_count(xor(c.w1, q.w1)) DESC,
             |                 c.vec_id) AS rn
             |    FROM ska q, skb c) WHERE rn <= 16),
             |fre AS MATERIALIZED (
             |  SELECT f.query_id, f.vec_id,
             |    round(list_cosine_similarity(ec.v, eq.v), 6) AS cosine,
             |    row_number() OVER (PARTITION BY f.query_id
             |      ORDER BY round(list_cosine_similarity(ec.v, eq.v), 6) DESC,
             |               f.vec_id) AS rk
             |  FROM fsl f JOIN e ec ON ec.vec_id = f.vec_id
             |             JOIN e eq ON eq.vec_id = f.query_id),
             |bsl AS (
             |  SELECT query_id, vec_id FROM (
             |    SELECT q.vec_id AS query_id, c.vec_id,
             |      row_number() OVER (PARTITION BY q.vec_id
             |        ORDER BY 64 - bit_count(xor(c.w0, q.w0))
             |                   - bit_count(xor(c.w1, q.w1)) DESC,
             |                 c.vec_id) AS rn
             |    FROM skb q, ska c) WHERE rn <= 16),
             |bre AS (
             |  SELECT f.query_id, f.vec_id,
             |    round(list_cosine_similarity(ec.v, eq.v), 6) AS cosine,
             |    row_number() OVER (PARTITION BY f.query_id
             |      ORDER BY round(list_cosine_similarity(ec.v, eq.v), 6) DESC,
             |               f.vec_id) AS rk
             |  FROM bsl f JOIN e ec ON ec.vec_id = f.vec_id
             |             JOIN e eq ON eq.vec_id = f.query_id),
             |dsrc AS (SELECT query_id, round(sum(cosine), 6) AS dsum
             |         FROM fre WHERE rk <= 4 GROUP BY 1),
             |dtgt AS (SELECT query_id, round(sum(cosine), 6) AS dsum
             |         FROM bre WHERE rk <= 4 GROUP BY 1),
             |sc AS (
             |  SELECT c.query_id, c.vec_id, c.cosine,
             |    round(c.cosine / ((ds.dsum + dt.dsum) / 8), 6) AS margin
             |  FROM fre c
             |  JOIN dsrc ds ON ds.query_id = c.query_id
             |  JOIN dtgt dt ON dt.query_id = c.vec_id
             |  WHERE c.rk <= 8),
             |best AS (
             |  SELECT query_id, vec_id, cosine, margin,
             |    row_number() OVER (PARTITION BY query_id
             |      ORDER BY margin DESC, vec_id) AS rn
             |  FROM sc)
             |SELECT query_id AS src_id, vec_id AS tgt_id, cosine, margin
             |FROM best WHERE rn = 1 AND margin >= 1.0
             |ORDER BY src_id""".stripMargin)),

    QueryDef("s26b_bitext_margin_blocked",
      // the PRODUCTION twin of s26: identical margin-criterion chain
      // (Artetxe & Schwenk ratio margin, 6dp lattice sums), but both
      // directions' shortlists come from [[graft.functions
      // .SimilarityFunctions.hammingTopKBlocked]] (8×8-bit LSH bands
      // over the sign sketch) instead of the broadcast kernel. Bitext
      // mining passes EACH side as the other's query set, so s26's
      // kernel is quadratic pair enumeration plus a corpus-sized
      // driver collect per direction; this form is two band equi-joins
      // with neither side collected — the shape that survives
      // CCMatrix-scale sides. Banding, Hamming, re-rank, densities,
      // margin, and the per-source argmax all replay in DuckDB
      // end-to-end (the s20c/s20b oracle-is-the-algorithm convention).
      // Band width is PINNED at 8 bits (r15, the s20c note): the width
      // sizedBandBits selects at every driver SF and the only one this
      // oracle replays — pinned so the agreement holds by construction
      // at any SF; the auto-sized production path stays covered by the
      // kernel spec and the sf1/sf10 probes (16-bit there, which s20d
      // hash-verifies).
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        S.marginBitextMine(
          emb.filter(col("label") % 2 === 0),
          emb.filter(col("label") % 2 === 1),
          k = 4, cand = 8, shortlist = 16, dim = 64, threshold = 1.0,
          blockedBandBits = Some(8))
          .orderBy("src_id")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings),
             |sk AS MATERIALIZED (
             |  SELECT vec_id,
             |    CAST(SUM(CASE WHEN t.d < 32 AND v[t.d + 1] > 0
             |      THEN (1::BIGINT << t.d) ELSE 0 END) AS BIGINT) AS w0,
             |    CAST(SUM(CASE WHEN t.d >= 32 AND v[t.d + 1] > 0
             |      THEN (1::BIGINT << (t.d - 32)) ELSE 0 END) AS BIGINT) AS w1
             |  FROM e, range(0, 64) t(d) GROUP BY vec_id),
             |bnd AS MATERIALIZED (
             |  SELECT vec_id, t.band,
             |    CASE WHEN t.band < 4 THEN (w0 >> (t.band * 8)) & 255
             |         ELSE (w1 >> ((t.band - 4) * 8)) & 255 END AS key
             |  FROM sk, range(0, 8) t(band)),
             |bna AS MATERIALIZED (SELECT b.* FROM bnd b JOIN e USING (vec_id)
             |        WHERE e.label % 2 = 0),
             |bnb AS MATERIALIZED (SELECT b.* FROM bnd b JOIN e USING (vec_id)
             |        WHERE e.label % 2 = 1),
             |fcd AS (
             |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id
             |  FROM bna q JOIN bnb c ON q.band = c.band AND q.key = c.key),
             |fsl AS (
             |  SELECT query_id, vec_id FROM (
             |    SELECT f.query_id, f.vec_id,
             |      row_number() OVER (PARTITION BY f.query_id
             |        ORDER BY 64 - bit_count(xor(c.w0, q.w0))
             |                   - bit_count(xor(c.w1, q.w1)) DESC,
             |                 f.vec_id) AS rn
             |    FROM fcd f JOIN sk c ON c.vec_id = f.vec_id
             |               JOIN sk q ON q.vec_id = f.query_id)
             |  WHERE rn <= 16),
             |fre AS MATERIALIZED (
             |  SELECT f.query_id, f.vec_id,
             |    round(list_cosine_similarity(ec.v, eq.v), 6) AS cosine,
             |    row_number() OVER (PARTITION BY f.query_id
             |      ORDER BY round(list_cosine_similarity(ec.v, eq.v), 6) DESC,
             |               f.vec_id) AS rk
             |  FROM fsl f JOIN e ec ON ec.vec_id = f.vec_id
             |             JOIN e eq ON eq.vec_id = f.query_id),
             |bcd AS (
             |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id
             |  FROM bnb q JOIN bna c ON q.band = c.band AND q.key = c.key),
             |bsl AS (
             |  SELECT query_id, vec_id FROM (
             |    SELECT f.query_id, f.vec_id,
             |      row_number() OVER (PARTITION BY f.query_id
             |        ORDER BY 64 - bit_count(xor(c.w0, q.w0))
             |                   - bit_count(xor(c.w1, q.w1)) DESC,
             |                 f.vec_id) AS rn
             |    FROM bcd f JOIN sk c ON c.vec_id = f.vec_id
             |               JOIN sk q ON q.vec_id = f.query_id)
             |  WHERE rn <= 16),
             |bre AS (
             |  SELECT f.query_id, f.vec_id,
             |    round(list_cosine_similarity(ec.v, eq.v), 6) AS cosine,
             |    row_number() OVER (PARTITION BY f.query_id
             |      ORDER BY round(list_cosine_similarity(ec.v, eq.v), 6) DESC,
             |               f.vec_id) AS rk
             |  FROM bsl f JOIN e ec ON ec.vec_id = f.vec_id
             |             JOIN e eq ON eq.vec_id = f.query_id),
             |dsrc AS (SELECT query_id, round(sum(cosine), 6) AS dsum
             |         FROM fre WHERE rk <= 4 GROUP BY 1),
             |dtgt AS (SELECT query_id, round(sum(cosine), 6) AS dsum
             |         FROM bre WHERE rk <= 4 GROUP BY 1),
             |sc AS (
             |  SELECT c.query_id, c.vec_id, c.cosine,
             |    round(c.cosine / ((ds.dsum + dt.dsum) / 8), 6) AS margin
             |  FROM fre c
             |  JOIN dsrc ds ON ds.query_id = c.query_id
             |  JOIN dtgt dt ON dt.query_id = c.vec_id
             |  WHERE c.rk <= 8),
             |best AS (
             |  SELECT query_id, vec_id, cosine, margin,
             |    row_number() OVER (PARTITION BY query_id
             |      ORDER BY margin DESC, vec_id) AS rn
             |  FROM sc)
             |SELECT query_id AS src_id, vec_id AS tgt_id, cosine, margin
             |FROM best WHERE rn = 1 AND margin >= 1.0
             |ORDER BY src_id""".stripMargin)),

    QueryDef("eval10_silhouette",
      // simplified silhouette per IVF cell ([[graft.functions
      // .SimilarityFunctions.simplifiedSilhouette]]; Hruschka 2004's
      // centroid form of Rousseeuw 1987): s = (b − a)/max(a,b) with
      // a = own-centroid and b = runner-up cosine distance — the
      // separation audit next to s21's size-balance audit. One
      // broadcast-centroid scan, O(n·k), distances on the 6dp lattice
      // so argmin/ties/b−a are engine-exact.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val cents = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("centroid_id"),
            col("embedding").as("centroid_vec"))
        S.simplifiedSilhouette(emb, cents)
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
             |sc AS (
             |  SELECT e.vec_id, c.cid,
             |    1 - round(list_cosine_similarity(e.v, c.cv), 6) AS d
             |  FROM e, c),
             |rk AS (
             |  SELECT vec_id, cid, d,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
             |  FROM sc),
             |ab AS (
             |  SELECT vec_id,
             |    min(CASE WHEN rn = 1 THEN d END) AS a,
             |    min(CASE WHEN rn = 2 THEN d END) AS b,
             |    min(CASE WHEN rn = 1 THEN cid END) AS cell
             |  FROM rk WHERE rn <= 2 GROUP BY 1),
             |s AS (
             |  SELECT cell,
             |    CASE WHEN greatest(a, b) <= 0 THEN 0.0
             |         ELSE round((b - a) / greatest(a, b), 6) END AS sil
             |  FROM ab)
             |SELECT cell AS centroid_id, count(*) AS n,
             |  round(avg(sil), 6) AS mean_silhouette
             |FROM s GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("s27_mmd_drift",
      // linear-time MMD² drift test for EMBEDDING columns ([[graft
      // .functions.SimilarityFunctions.mmdLinear]]; Gretton et al. JMLR
      // 2012 eq. 14): the distribution-level companion to the scalar
      // drift family (PSI/KS/KL see only marginals). Two scenarios in
      // one result: the vec_id parity split (same distribution → ≈ 0)
      // and a planted +1 shift on the first coordinate (must light up)
      // — the null case and the positive control certify the test both
      // ways. One narrow pass over dense-id-indexed rows; no pairwise
      // join anywhere.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val x = emb.filter(col("vec_id") % 2 === 0)
          .select(expr("vec_id div 2").as("idx"), col("embedding"))
        val y = emb.filter(col("vec_id") % 2 === 1)
          .select(expr("vec_id div 2").as("idx"),
            col("embedding").cast("array<double>").as("embedding"))
        val yShift = y.select(col("idx"),
          concat(array(element_at(col("embedding"), 1) + lit(1.0)),
            slice(col("embedding"), 2, 63)).as("embedding"))
        S.mmdLinear(x, y, denom = 64.0)
          .withColumn("scenario", lit("parity_null"))
          .unionByName(S.mmdLinear(x, yShift, denom = 64.0)
            .withColumn("scenario", lit("planted_shift")))
          .select(col("scenario"), col("m_quads"), col("mmd2"))
          .orderBy("scenario")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |x AS (SELECT vec_id // 2 AS idx, v FROM e WHERE vec_id % 2 = 0),
             |y AS (SELECT vec_id // 2 AS idx, v FROM e WHERE vec_id % 2 = 1),
             |ys AS (SELECT idx, [v[1] + 1.0] || v[2:] AS v FROM y),
             |x0 AS (SELECT idx // 2 AS q, v FROM x WHERE idx % 2 = 0),
             |x1 AS (SELECT idx // 2 AS q, v FROM x WHERE idx % 2 = 1),
             |y0 AS (SELECT idx // 2 AS q, v FROM y WHERE idx % 2 = 0),
             |y1 AS (SELECT idx // 2 AS q, v FROM y WHERE idx % 2 = 1),
             |s0 AS (SELECT idx // 2 AS q, v FROM ys WHERE idx % 2 = 0),
             |s1 AS (SELECT idx // 2 AS q, v FROM ys WHERE idx % 2 = 1),
             |hn AS (
             |  SELECT round(exp(-(list_inner_product(x0.v, x0.v)
             |        + list_inner_product(x1.v, x1.v)
             |        - 2.0 * list_inner_product(x0.v, x1.v)) / 64.0), 6)
             |     + round(exp(-(list_inner_product(y0.v, y0.v)
             |        + list_inner_product(y1.v, y1.v)
             |        - 2.0 * list_inner_product(y0.v, y1.v)) / 64.0), 6)
             |     - round(exp(-(list_inner_product(x0.v, x0.v)
             |        + list_inner_product(y1.v, y1.v)
             |        - 2.0 * list_inner_product(x0.v, y1.v)) / 64.0), 6)
             |     - round(exp(-(list_inner_product(x1.v, x1.v)
             |        + list_inner_product(y0.v, y0.v)
             |        - 2.0 * list_inner_product(x1.v, y0.v)) / 64.0), 6) AS h
             |  FROM x0 JOIN x1 USING (q) JOIN y0 USING (q) JOIN y1 USING (q)),
             |hs AS (
             |  SELECT round(exp(-(list_inner_product(x0.v, x0.v)
             |        + list_inner_product(x1.v, x1.v)
             |        - 2.0 * list_inner_product(x0.v, x1.v)) / 64.0), 6)
             |     + round(exp(-(list_inner_product(s0.v, s0.v)
             |        + list_inner_product(s1.v, s1.v)
             |        - 2.0 * list_inner_product(s0.v, s1.v)) / 64.0), 6)
             |     - round(exp(-(list_inner_product(x0.v, x0.v)
             |        + list_inner_product(s1.v, s1.v)
             |        - 2.0 * list_inner_product(x0.v, s1.v)) / 64.0), 6)
             |     - round(exp(-(list_inner_product(x1.v, x1.v)
             |        + list_inner_product(s0.v, s0.v)
             |        - 2.0 * list_inner_product(x1.v, s0.v)) / 64.0), 6) AS h
             |  FROM x0 JOIN x1 USING (q) JOIN s0 USING (q) JOIN s1 USING (q))
             |SELECT 'parity_null' AS scenario, count(*) AS m_quads,
             |       round(avg(h), 6) AS mmd2 FROM hn
             |UNION ALL
             |SELECT 'planted_shift', count(*), round(avg(h), 6) FROM hs
             |ORDER BY scenario""".stripMargin))
  )
}
