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

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Cosine similarity; null when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b) / nullif(norm(a) * norm(b), lit(0.0))
    d
  }

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
    val scored = corpus.crossJoin(broadcast(queries))
      .withColumn("_cos", round(cosine(col(vecCol), col(qVecCol)), 6))
      .filter(col(idCol) =!= col(qIdCol)) // exclude self-match when ids collide
      .filter(col("_cos").isNotNull)
      .select(col(qIdCol).cast("long"), col(idCol).cast("long"), col("_cos"))
      .as[(Long, Long, Double)]
    // worst-first ordering: lower cosine is worse; on equal cosine a
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
      .select(col("_q").as(qIdCol), col("_id").as(idCol),
        col("_c").as("cosine"), col("rank"))
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

  /** IVF-style ANN: assign every corpus vector to its nearest of
    * `centroids` (broadcast, built by the caller — e.g. sampled corpus
    * rows, a k-means pass, or a provided label partitioner); queries probe
    * only `nProbe` nearest centroids' partitions. Turns an all-corpus scan
    * per query into a fraction `nProbe / nCentroids` of the corpus.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      k: Int, nProbe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qIdCol: String = "query_id", qVecCol: String = "query_vec",
      cIdCol: String = "centroid_id", cVecCol: String = "centroid_vec"): DataFrame = {
    val wC = Window.partitionBy(col(idCol)).orderBy(col("_csim").desc_nulls_last, col(cIdCol))
    val assigned = corpus.crossJoin(broadcast(centroids))
      .withColumn("_csim", cosine(col(vecCol), col(cVecCol)))
      .withColumn("_crank", row_number().over(wC))
      .filter(col("_crank") === 1)
      .select(col(idCol), col(vecCol), col(cIdCol).as("_cell"))
    val wQ = Window.partitionBy(col(qIdCol)).orderBy(col("_csim").desc_nulls_last, col(cIdCol))
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("_csim", cosine(col(qVecCol), col(cVecCol)))
      .withColumn("_crank", row_number().over(wQ))
      .filter(col("_crank") <= nProbe)
      .select(col(qIdCol), col(qVecCol), col(cIdCol).as("_cell"))
    val scored = assigned.join(broadcast(probes), Seq("_cell"))
      .withColumn("cosine", cosine(col(vecCol), col(qVecCol)))
      .filter(col(idCol) =!= col(qIdCol))
    val w = Window.partitionBy(col(qIdCol))
      .orderBy(col("cosine").desc_nulls_last, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col(idCol), round(col("cosine"), 6).as("cosine"), col("rank"))
  }
}
