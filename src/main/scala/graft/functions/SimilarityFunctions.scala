package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Brute-force cosine is the exact baseline: a single projection per
  * (query, row) pair — for a handful of queries it's a broadcast of the
  * query vectors and ONE scan of the corpus, which is optimal. The scale
  * path for all-pairs / many-query workloads is LSH bucketing (random
  * hyperplane signatures, self-join on bucket) or IVF (coarse quantizer →
  * probe nearest partitions), both below.
  *
  * All vector math uses `zip_with`/`aggregate` expressions in double
  * precision — codegen'd, no UDF, deterministic accumulation order
  * (sequential left fold over array elements).
  */
object SimilarityFunctions {

  /** Native codegen dot product (see [[VecDot]]); [[dotHof]] is the
    * higher-order-function baseline with identical fold semantics.
    */
  def dot(a: Column, b: Column): Column = VecDot(a, b)

  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Cosine similarity; null when either vector has zero norm, when
    * lengths differ, or when any element is null. Backed by the native
    * codegen [[VecCosine]] expression — bit-identical to [[cosineHof]]
    * (same element-order accumulation) but runs inside whole-stage
    * codegen, which higher-order functions never do.
    */
  def cosine(a: Column, b: Column): Column = VecCosine(a, b)

  /** The higher-order-function formulation — the composition-first
    * baseline [[cosine]] is verified against (see SimilarityFunctionsSpec).
    */
  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / nullif(norm(a) * norm(b), lit(0.0))

  /** Exact top-k neighbors for each query vector, two-phase:
    * phase 1 keeps a bounded per-(partition, query) heap inside
    * `mapPartitions` — each partition emits at most `k × |queries|` rows,
    * so NO shuffle of the |corpus|×|queries| scored rows ever happens;
    * phase 2 is a window rank over the tiny per-partition survivors.
    * `queries` is small (broadcast); corpus scanned exactly once.
    *
    * Cosine is rounded to 6 dp BEFORE ranking so ranking is insensitive
    * to accumulation-order noise in the dot product; ties broken by
    * corpus id → fully deterministic output.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qIdCol: String = "query_id", qVecCol: String = "query_vec"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    requireIntegralId(corpus, idCol); requireIntegralId(queries, qIdCol)
    val scored = corpus.crossJoin(broadcast(queries))
      .withColumn("_cos", round(cosine(col(vecCol), col(qVecCol)), 6))
      .filter(col(idCol) =!= col(qIdCol)) // exclude self-match when ids collide
      .filter(col("_cos").isNotNull)
      .select(col(qIdCol).cast("long"), col(idCol).cast("long"), col("_cos"))
      .as[(Long, Long, Double)]
    topKPerQuery(scored, k)
      .select(col("_q").as(qIdCol), col("_id").as(idCol),
        col("_c").as("cosine"), col("rank"))
  }

  /** The bounded-heap top-k path encodes ids as longs; fail fast with a
    * clear message instead of an ANSI cast error mid-job when a caller
    * brings string/UUID ids (those need a surrogate id column first).
    */
  private def requireIntegralId(df: DataFrame, idCol: String): Unit = {
    val dt = df.schema(idCol).dataType
    require(Seq("long", "integer", "short", "byte").contains(dt.typeName),
      s"top-k id column '$idCol' must be integral (got $dt); " +
        "add a surrogate integral id for non-numeric keys")
  }

  /** Two-phase exact top-k over (query, id, score) rows: per-partition
    * bounded heaps inside mapPartitions (each partition emits ≤
    * k × |queries| rows), then one tiny window rank over the survivors.
    * Output columns `_q, _id, _c, rank`; ties broken by lower id.
    */
  def topKPerQuery(scored: org.apache.spark.sql.Dataset[(Long, Long, Double)],
      k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    // worst-first ordering: lower score is worse; on equal score a
    // HIGHER id is worse (final tie-break prefers the lower id).
    val worstFirst = Ordering.by[(Double, Long), (Double, Long)] {
      case (c, id) => (-c, id)
    }
    val partial = scored.mapPartitions { it =>
      val heaps = scala.collection.mutable.Map
        .empty[Long, scala.collection.mutable.PriorityQueue[(Double, Long)]]
      it.foreach { case (q, id, c) =>
        val h = heaps.getOrElseUpdate(q,
          scala.collection.mutable.PriorityQueue.empty[(Double, Long)](worstFirst))
        if (h.size < k) h.enqueue((c, id))
        else if (worstFirst.lt((c, id), h.head)) { h.dequeue(); h.enqueue((c, id)) }
      }
      heaps.iterator.flatMap { case (q, h) =>
        h.iterator.map { case (c, id) => (q, id, c) }
      }
    }
    val w = Window.partitionBy(col("_q")).orderBy(col("_c").desc, col("_id"))
    partial.toDF("_q", "_id", "_c")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Random-hyperplane LSH signature: bit i = sign(dot(v, h_i)) where the
    * hyperplanes are generated from a deterministic seed (splitmix-style
    * integer mix → uniform in [-1, 1)) so executors need no shared state.
    *
    * All `dim × nBits` plane coefficients are bound to ONE
    * `typedLit(array<array<double>>)` — a single literal in the plan —
    * instead of nBits separate dim-sized literals, which at 768-dim ×
    * 16 bits would inject ~12k constants and bloat every analysis pass.
    */
  def hyperplaneSignature(vec: Column, dim: Int, nBits: Int, seed: Long = 42L): Column = {
    def mix(i: Int, j: Int): Double = {
      var z = seed + i.toLong * 0x9E3779B97F4A7C15L + j.toLong * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      (z.toDouble / Long.MaxValue.toDouble)
    }
    val planes = typedLit((0 until nBits).map(i => (0 until dim).map(j => mix(i, j))))
    val idx = sequence(lit(0), lit(nBits - 1))
    aggregate(
      zip_with(planes, idx, (h, i) =>
        when(dot(vec, h) >= 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, b) => acc.bitwiseOR(b))
  }

  /** LSH-bucketed approximate near-neighbor pairs: same signature bucket →
    * candidate; verify exact cosine on candidates only. Self-join keyed on
    * the signature = hash-partitionable equi-join.
    */
  def lshNeighborPairs(corpus: DataFrame, dim: Int, nBits: Int = 16,
      minCosine: Double = 0.8, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val sig = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("sig", hyperplaneSignature(col("v"), dim, nBits))
    sig.as("x").join(sig.as("y"), Seq("sig"))
      .filter(col("x.id") < col("y.id"))
      .withColumn("cosine", cosine(col("x.v"), col("y.v")))
      .filter(col("cosine") >= minCosine)
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Nearest-centroid cell id as ONE projection: fold over the literal
    * centroid array carrying (bestSim, bestCell). No join, no window, no
    * shuffle — the corpus is scanned exactly once. Ties and null
    * similarities keep the earlier (lower-id) centroid.
    */
  private def nearestCell(vec: Column, cents: Seq[(Long, Seq[Double])]): Column = {
    val cArr = typedLit(cents)
    aggregate(cArr,
      struct(lit(Double.MinValue).as("s"), lit(-1L).as("c")),
      (acc, ct) => {
        val sim = cosine(vec, ct.getField("_2"))
        when(sim > acc.getField("s"), struct(sim.as("s"), ct.getField("_1").as("c")))
          .otherwise(acc)
      }).getField("c")
  }

  /** IVF-style ANN: assign every corpus vector to its nearest centroid
    * (a pure projection over the driver-known centroid list — centroids
    * are small by construction: a sample or k-means output); queries
    * probe only their `nProbe` nearest cells. Turns an all-corpus scan
    * per query into a fraction `nProbe / nCentroids` of the corpus.
    * Final per-query top-k is the same two-phase bounded-heap shape as
    * [[bruteForceTopK]] — nothing here shuffles scored rows.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      k: Int, nProbe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qIdCol: String = "query_id", qVecCol: String = "query_vec",
      cIdCol: String = "centroid_id", cVecCol: String = "centroid_vec"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    requireIntegralId(corpus, idCol); requireIntegralId(queries, qIdCol)
    val cents: Seq[(Long, Seq[Double])] = centroids
      .select(col(cIdCol).cast("long"), col(cVecCol).cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    val assigned = corpus.withColumn("_cell", nearestCell(col(vecCol), cents))
    // top-nProbe cells per query as a projection: sort the centroid array
    // by (sim desc, cid asc) via a sortable (negSim, cid) struct, slice.
    val cArr = typedLit(cents)
    val probeCells = slice(sort_array(transform(cArr, ct =>
      call_function("named_struct",
        lit("negSim"), coalesce(-cosine(col(qVecCol), ct.getField("_2")), lit(Double.MaxValue)),
        lit("cid"), ct.getField("_1")))), 1, nProbe)
    val probes = queries.withColumn("_pc", explode(probeCells))
      .select(col(qIdCol), col(qVecCol), col("_pc").getField("cid").as("_cell"))
    val scored = assigned.join(broadcast(probes), Seq("_cell"))
      .withColumn("_cos", round(cosine(col(vecCol), col(qVecCol)), 6))
      .filter(col(idCol) =!= col(qIdCol))
      .filter(col("_cos").isNotNull)
      .select(col(qIdCol).cast("long"), col(idCol).cast("long"), col("_cos"))
      .as[(Long, Long, Double)]
    topKPerQuery(scored, k)
      .select(col("_q").as(qIdCol), col("_id").as(idCol),
        col("_c").as("cosine"), col("rank"))
  }
}
