package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{SimilarityFunctions => S}

/** Dev-only: dump the optimized plan of hammingTopK's scored stage. */
object DevPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.select(col("vec_id").as("query_id"),
      col("embedding").as("query_vec"))
    val c = emb.select(col("vec_id").cast("long").as("_id"),
      S.signSketch(col("embedding"), 64).as("_s"))
    val qs = q.select(col("query_id").cast("long").as("_q"),
      S.signSketch(col("query_vec"), 64).as("_qs"))
    val matching = lit(64) - (0 until 2).map(w =>
      expr(s"bit_count(_s.w$w ^ _qs.w$w)")).reduce(_ + _)
    val scored = c.crossJoin(broadcast(qs))
      .filter(col("_id") =!= col("_q"))
      .select(col("_q"), col("_id"), matching.cast("double").as("_m"))
    println("=== OPTIMIZED ===")
    println(scored.queryExecution.optimizedPlan.toString.take(8000))
    spark.stop()
  }
}
