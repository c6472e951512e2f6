package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{SimilarityFunctions => S}

/** Dev-only stage timer for the s20b composition (hamming shortlist →
  * exact re-rank → reciprocal join) — attributes the 71 s first-cut
  * bench to a stage. Not part of the registry; delete when closed.
  */
object DevS20bAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/embeddings.parquet").count()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[s20b] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.select(col("vec_id").as("query_id"),
      col("embedding").as("query_vec"))

    // stage 1: sketch both sides only (no join)
    time("sketch both sides") {
      emb.select(col("vec_id"),
        S.signSketch(col("embedding"), 64).as("_s")).count()
    }

    // bisect: raw pairwise scan without the heap
    time("pairwise scored count (no heap)") {
      val c = emb.select(col("vec_id").cast("long").as("_id"),
        S.signSketch(col("embedding"), 64).as("_s"))
      val qs = q.select(col("query_id").cast("long").as("_q"),
        S.signSketch(col("query_vec"), 64).as("_qs"))
      val matching = lit(64) - (0 until 2).map(w =>
        expr(s"bit_count(_s.w$w ^ _qs.w$w)")).reduce(_ + _)
      c.crossJoin(broadcast(qs))
        .filter(col("_id") =!= col("_q"))
        .select(col("_q"), col("_id"), matching.cast("double").as("_m"))
        .count()
    }

    // bisect: pre-materialized sketches, then the same join
    time("pairwise with persisted sketches") {
      val c = emb.select(col("vec_id").cast("long").as("_id"),
        S.signSketch(col("embedding"), 64).as("_s")).persist()
      c.count()
      val qs = q.select(col("query_id").cast("long").as("_q"),
        S.signSketch(col("query_vec"), 64).as("_qs")).persist()
      qs.count()
      val matching = lit(64) - (0 until 2).map(w =>
        expr(s"bit_count(_s.w$w ^ _qs.w$w)")).reduce(_ + _)
      val n = c.crossJoin(broadcast(qs))
        .filter(col("_id") =!= col("_q"))
        .select(col("_q"), col("_id"), matching.cast("double").as("_m"))
        .count()
      c.unpersist(); qs.unpersist()
      n
    }

    // bisect: the heap phase alone on persisted scored rows
    {
      import spark.implicits._
      val c = emb.select(col("vec_id").cast("long").as("_id"),
        S.signSketch(col("embedding"), 64).as("_s"))
      val qs = q.select(col("query_id").cast("long").as("_q"),
        S.signSketch(col("query_vec"), 64).as("_qs"))
      val matching = lit(64) - (0 until 2).map(w =>
        expr(s"bit_count(_s.w$w ^ _qs.w$w)")).reduce(_ + _)
      val scored = c.crossJoin(broadcast(qs))
        .filter(col("_id") =!= col("_q"))
        .select(col("_q"), col("_id"), matching.cast("double").as("_m"))
        .as[(Long, Long, Double)]
      time("scored fully materialized") { scored.persist(); scored.count() }
      time("topKPerQuery(50) on persisted") {
        S.topKPerQuery(scored, 50).count()
      }
      scored.unpersist()
      val live = c.crossJoin(broadcast(qs))
        .filter(col("_id") =!= col("_q"))
        .select(col("_q"), col("_id"), matching.cast("double").as("_m"))
        .as[(Long, Long, Double)]
      time("topKPerQuery(50) live (no pin)") {
        S.topKPerQuery(live, 50).count()
      }
      println("[s20b] live plan:\n" +
        S.topKPerQuery(live, 50).queryExecution.executedPlan.toString.take(4000))
    }

    // stage 2: hamming shortlist k=50
    val short = time("hammingTopK k=50 (materialize)") {
      val sh = S.hammingTopK(emb, q, k = 50, dim = 64)
        .select(col("query_id"), col("vec_id"))
      sh.persist(); sh.count(); sh
    }

    // stage 3: exact re-rank of the shortlist to top-1
    val wQ = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("vec_id"))
    val best = time("exact rerank top-1") {
      val b = short
        .join(emb.select(col("vec_id"),
          col("embedding").cast("array<double>").as("_v")), "vec_id")
        .join(emb.select(col("vec_id").as("query_id"),
          col("embedding").cast("array<double>").as("_qv")), "query_id")
        .withColumn("cosine", round(S.cosine(col("_v"), col("_qv")), 6))
        .withColumn("_rn", row_number().over(wQ))
        .filter(col("_rn") === 1)
        .select(col("query_id").as("a"), col("vec_id").as("b"), col("cosine"))
      b.persist(); b.count(); b
    }

    // stage 4: reciprocal join
    time("reciprocal join") {
      best.as("x").join(best.as("y"),
          col("x.a") === col("y.b") && col("x.b") === col("y.a") &&
            col("x.a") < col("x.b"))
        .count()
    }
    spark.stop()
  }
}
